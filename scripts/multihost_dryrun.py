"""Multi-host dryrun: N CPU processes x M virtual devices, one global mesh.

Validates the DCN code path (parallel/distributed.py) end-to-end without
pod hardware: each process calls jax.distributed.initialize, builds the
GLOBAL mesh inside optimize_compiled (jax.devices() spans all
processes), and runs the full optimize — sharded evolve steps, the
per-chunk top-K population exchange (a cross-PROCESS collective here),
replicated stats fetches, and the gathered extraction — on a small
set-cover instance. Mirrors BASELINE.md's "N>=2 hosts" configuration.

Usage:
  python scripts/multihost_dryrun.py              # launcher: spawns 2x4
  python scripts/multihost_dryrun.py --procs 2 --devs 4
  (internal) python scripts/multihost_dryrun.py --worker I --procs N ...
"""

import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def worker(proc_id: int, procs: int, devs: int, port: int) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={devs}"
    )
    sys.path.insert(0, REPO)
    import jax

    jax.config.update("jax_platforms", "cpu")

    from baryonyx_tpu.parallel.distributed import init_distributed

    init_distributed(f"127.0.0.1:{port}", num_processes=procs, process_id=proc_id)
    assert jax.process_count() == procs
    assert len(jax.devices()) == procs * devs, (
        f"global mesh wrong: {len(jax.devices())}"
    )

    import baryonyx_tpu as bx
    from baryonyx_tpu.generators import random_set_cover_lp
    from baryonyx_tpu.validate import is_valid_solution

    pb = bx.parse_lp(random_set_cover_lp(20, 60, 0.15, seed=9))
    ctx = bx.make_context(0)
    ctx.parameters.seed = 11
    ctx.parameters.time_limit = 5.0
    ctx.parameters.limit = 2000
    ctx.parameters.thread = 2 * procs * devs  # 2 replicas per device
    ctx.parameters.init_population_size = 8
    r = bx.optimize(ctx, pb)
    ok = r.status == bx.ResultStatus.success and is_valid_solution(pb, r)
    print(
        f"MULTIHOST proc {proc_id}/{procs}: status={r.status.name} "
        f"value={r.solutions[-1].value if r.solutions else None} ok={ok}",
        flush=True,
    )
    assert ok, "multihost optimize failed"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", type=int, default=2)
    ap.add_argument("--devs", type=int, default=4)
    ap.add_argument("--port", type=int, default=9382)
    ap.add_argument("--worker", type=int, default=None)
    args = ap.parse_args()

    if args.worker is not None:
        worker(args.worker, args.procs, args.devs, args.port)
        return

    procs = []
    for i in range(args.procs):
        procs.append(subprocess.Popen(
            [
                sys.executable, os.path.abspath(__file__),
                "--worker", str(i), "--procs", str(args.procs),
                "--devs", str(args.devs), "--port", str(args.port),
            ],
            cwd=REPO,
        ))
    codes = [p.wait(timeout=600) for p in procs]
    assert all(c == 0 for c in codes), f"worker exit codes {codes}"
    print(f"MULTIHOST DRYRUN OK: {args.procs} processes x {args.devs} devices")


if __name__ == "__main__":
    main()
