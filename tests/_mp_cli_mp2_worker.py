"""Worker for the two-process model-parallel CLI training test
(tests/test_multiprocess.py).

Runs run_training with --model_parallel 2 under jax.distributed: the mesh is
{data: 4, model: 2} over 2 processes x 4 CPU devices, so 'model'-sharded
leaves (e.g. out_linear/weight) span BOTH hosts. Exercises the full
cross-host checkpoint cycle: epoch-0 training -> collective all-gather save
(utils/checkpoint._np_global) -> restore from the epoch file -> epoch-1
training from restored, re-sharded params.

Usage: python tests/_mp_cli_mp2_worker.py <process_id> <port> <data_dir>
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

ckpt_path = os.path.join(data_dir, "mp2_ckpt.npz")
common = [
    "--data_dir", data_dir, "--model", "film_gp_pt", "--batch_size", "8",
    "--num_res_blocks", "1", "--num_res_block_channels", "16",
    "--num_tail_channels", "4", "--embed_size", "8", "--hidden_size", "8",
    "--compute_dtype", "float32", "--feature_cache", "true",
    "--jax_cache_dir", os.path.join(data_dir, ".xla_cache"),
    "--mesh_devices", "8", "--model_parallel", "2", "--distributed", "true",
    "--coordinator_address", f"localhost:{port}",
    "--num_processes", "2", "--process_id", pid,
]


from jax.experimental import multihost_utils as mhu  # noqa: E402


def leafsum(tree):
    """Sum over GLOBAL leaf values (all-gathers cross-host-sharded leaves —
    a collective, so both processes call it at the same point)."""
    total = 0.0
    for l in jax.tree.leaves(tree):
        if isinstance(l, jax.Array) and not l.is_fully_addressable:
            l = mhu.process_allgather(l, tiled=True)
        total += float(np.asarray(l).sum())
    return total


# epoch 0: train + checkpoint (collective gather of model-sharded leaves)
args = build_q_and_v_parser().parse_args(
    common + ["--num_epochs", "1", "--checkpoint_path", ckpt_path])
params, _ = run_training(args, "film_gp_pt")
assert jax.process_count() == 2, jax.process_count()
# the live params include cross-host 'model'-sharded leaves
shardspecs = {str(l.sharding.spec) for l in jax.tree.leaves(params)}
assert any("model" in s for s in shardspecs), shardspecs
live0 = leafsum(params)

from videonavqa_tpu.utils.checkpoint import epoch_path, load_checkpoint  # noqa: E402

e0 = epoch_path(ckpt_path, 0)
assert os.path.exists(e0), e0
from videonavqa_tpu.models import get_model  # noqa: E402
from videonavqa_tpu.cli.common import cfg_from_args  # noqa: E402

spec = get_model("film_gp_pt")
tmpl_p, tmpl_s = spec.init(jax.random.PRNGKey(0), cfg_from_args(args, "film_gp_pt"))
ck_params, _, _, meta = load_checkpoint(e0, params_template=tmpl_p,
                                        state_template=tmpl_s)
ck0 = leafsum(ck_params)
assert meta["epoch"] == 0, meta

# epoch 1: restore from the epoch-0 file and keep training model-parallel
args2 = build_q_and_v_parser().parse_args(
    common + ["--num_epochs", "1", "--checkpoint_path", e0])
params2, _ = run_training(args2, "film_gp_pt")
final = leafsum(params2)

print(f"CLIMP2 pid={pid} live0={live0:.6f} ck0={ck0:.6f} final={final:.6f}",
      flush=True)
