"""Worker for the two-process DP test (tests/test_multiprocess.py).

Each process owns 4 virtual CPU devices; jax.distributed glues them into one
8-device global mesh. Exercises parallel.multihost with process_count == 2:
initialize(), host_batch_slice(), global_batch_from_host_shards().

Usage: python tests/_mp_worker.py <process_id> <coordinator_port>
"""

import os
import sys

pid = int(sys.argv[1])
port = int(sys.argv[2])

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from videonavqa_tpu.models import ModelConfig, get_model  # noqa: E402
from videonavqa_tpu.parallel import make_mesh, multihost  # noqa: E402
from videonavqa_tpu.train.step import make_optimizer, make_train_step  # noqa: E402

multihost.initialize(coordinator_address=f"localhost:{port}",
                     num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 8 and jax.local_device_count() == 4

CFG = ModelConfig(model="film_gp_pt", num_res_blocks=1, num_res_block_channels=16,
                  num_input_channels=8, num_tail_channels=4, max_num_frames=3,
                  compute_dtype="float32", num_classes=8, vocab_size=17,
                  embed_size=8, hidden_size=8)

GLOBAL_B, T = 16, 3


def global_batch_np():
    """The full deterministic batch — identical in every process."""
    rng = np.random.RandomState(7)
    return {
        "v_features": rng.randn(GLOBAL_B, T, 10, 13, CFG.num_input_channels)
                         .astype(np.float32),
        "question": rng.randint(1, CFG.vocab_size, size=(GLOBAL_B, 7))
                       .astype(np.int32),
        "v_len": np.full((GLOBAL_B,), T, np.int32),
        "q_len": np.full((GLOBAL_B,), 4, np.int32),
        "label": rng.randint(0, CFG.num_classes, size=(GLOBAL_B,)).astype(np.int32),
    }


def main():
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh(8, model_parallel=1)
    spec = get_model(CFG.model)
    params, state = spec.init(jax.random.PRNGKey(0), CFG)
    optimizer = make_optimizer(1e-3)
    opt_state = optimizer.init(params)
    step = make_train_step(spec, CFG, optimizer, reduction="sum", clip_value=1.0,
                           donate=False)

    # replicate params/state/opt across the global mesh from host copies
    # (identical on every process by construction: same PRNGKey)
    rep = NamedSharding(mesh, P())
    replicate = lambda tree: jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(rep, np.asarray(x)), tree)
    params, state, opt_state = map(replicate, (params, state, opt_state))

    # each host loads only ITS slice, then assembles the global DP batch
    start, size = multihost.host_batch_slice(GLOBAL_B)
    local = {k: v[start:start + size] for k, v in global_batch_np().items()}
    batch = multihost.global_batch_from_host_shards(mesh, local)

    with mesh:
        params, state, opt_state, metrics = step(
            params, state, opt_state, batch, jax.random.PRNGKey(5))
    loss = float(metrics["loss"])
    grad_norm = float(metrics["grad_norm"])
    # a param leaf checksum proves the update is identical across hosts
    leaf = np.asarray(jax.tree.leaves(params)[0]).sum()
    print(f"MPRESULT pid={pid} loss={loss:.6f} grad_norm={grad_norm:.6f} "
          f"leafsum={leaf:.6f}", flush=True)


main()
