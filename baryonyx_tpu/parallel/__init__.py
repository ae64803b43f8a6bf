"""Multi-chip scaling: replica sharding over a device mesh.

reference: the reference's only parallel axis is the std::thread multi-start
pool with a mutex-shared population (itm-optimizer-common.hpp:802-862);
here replicas live on the lane axis and shard across chips
(SURVEY.md section 2.9).
"""

from baryonyx_tpu.parallel.mesh import make_mesh, shard_opt_state
