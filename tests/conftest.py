"""Test configuration: force JAX onto a virtual 8-device CPU mesh so sharding
paths are exercised without TPU hardware (and without the axon tunnel)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_collective_call_terminate_timeout_seconds" not in flags:
    # 8 virtual devices share one contended core: the default 20s-warn/40s-die
    # collective rendezvous budget intermittently SIGABRTs healthy runs
    flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
              " --xla_cpu_collective_call_terminate_timeout_seconds=600")
os.environ["XLA_FLAGS"] = flags
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The sandbox pre-imports jax via PYTHONPATH site hooks with JAX_PLATFORMS=axon;
# override the already-materialized config value too.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
