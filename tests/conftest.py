"""Test configuration: force JAX onto CPU with 8 virtual devices so the
multi-chip sharding paths run without TPU hardware (SURVEY.md section 4:
the TPU-native analogue of the reference's real-thread-pool tests)."""

import os

# NOTE: this image's sitecustomize imports jax at interpreter startup
# (before conftest runs) and pins the axon TPU platform, so setting
# JAX_PLATFORMS here is too late — the override must go through
# jax.config before any backend is initialized.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", (
    "tests must run on the virtual-CPU mesh; a TPU backend initialized "
    "before conftest could override it"
)
