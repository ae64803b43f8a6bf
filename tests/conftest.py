"""Test configuration: force JAX onto CPU with 8 virtual devices so the
multi-chip sharding paths run without TPU hardware (SURVEY.md section 4:
the TPU-native analogue of the reference's real-thread-pool tests)."""

import os

# NOTE: this image pins JAX_PLATFORMS=axon (the TPU tunnel); both variables
# must be overridden to actually land on CPU.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
