"""Test configuration: force JAX onto a virtual 8-device CPU mesh so sharding
paths are exercised without TPU hardware (and without the axon tunnel)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The sandbox pre-imports jax via PYTHONPATH site hooks with JAX_PLATFORMS=axon;
# override the already-materialized config value too.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
