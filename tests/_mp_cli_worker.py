"""Worker for the two-process CLI training test (tests/test_multiprocess.py).

Runs the ACTUAL user-facing harness (run_training) under jax.distributed:
--distributed wires multihost.initialize, --mesh_devices 8 spans both
processes' 4 CPU devices, the feature-cache VNR loaders decode only each
host's row_slice, and process 0 extracts the cache while process 1 waits at
the barrier.

Usage: python tests/_mp_cli_worker.py <process_id> <port> <data_dir>
"""

import os
import sys

pid = sys.argv[1]
port = sys.argv[2]
data_dir = sys.argv[3]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from videonavqa_tpu.cli.common import build_q_and_v_parser, run_training  # noqa: E402

args = build_q_and_v_parser().parse_args([
    "--data_dir", data_dir, "--model", "film_gp_pt", "--batch_size", "8",
    "--num_res_blocks", "1", "--num_res_block_channels", "16",
    "--num_tail_channels", "4", "--embed_size", "8", "--hidden_size", "8",
    "--num_epochs", "1", "--compute_dtype", "float32",
    "--feature_cache", "true",
    "--jax_cache_dir", os.path.join(data_dir, ".xla_cache"),
    "--mesh_devices", "8", "--distributed", "true",
    "--coordinator_address", f"localhost:{port}",
    "--num_processes", "2", "--process_id", pid,
])
params, state = run_training(args, "film_gp_pt")
assert jax.process_count() == 2, jax.process_count()
leafsum = sum(float(np.asarray(l).sum()) for l in jax.tree.leaves(params))
print(f"CLIMP pid={pid} leafsum={leafsum:.6f}", flush=True)
