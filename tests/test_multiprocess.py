"""Real multi-process data-parallel training: two OS processes, 4 CPU devices
each, one 8-device global mesh (jax.distributed over Gloo).

This is the process_count > 1 exercise of parallel/multihost.py — each process
loads only its host_batch_slice, global_batch_from_host_shards assembles the
global batch, and the DP step must reproduce the single-process numerics.
"""

import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_mp_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_two_process_dp_matches_single_process():
    port = _free_port()
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [subprocess.Popen([sys.executable, WORKER, str(pid), str(port)],
                              stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                              text=True, env=env, cwd=REPO)
             for pid in (0, 1)]
    outs = [p.communicate(timeout=420)[0] for p in procs]
    results = []
    for pid, out in enumerate(outs):
        assert procs[pid].returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
        m = re.search(r"MPRESULT pid=\d+ loss=([\d.]+) grad_norm=([\d.]+) "
                      r"leafsum=(-?[\d.]+)", out)
        assert m, f"no result line from worker {pid}:\n{out[-3000:]}"
        results.append(tuple(float(g) for g in m.groups()))

    # both processes must agree bit-for-bit on the global quantities
    assert results[0] == results[1], results

    # ... and match a single-process run of the same step on the same batch
    from videonavqa_tpu.models import ModelConfig, get_model
    from videonavqa_tpu.train.step import make_optimizer, make_train_step

    CFG = ModelConfig(model="film_gp_pt", num_res_blocks=1,
                      num_res_block_channels=16, num_input_channels=8,
                      num_tail_channels=4, max_num_frames=3,
                      compute_dtype="float32", num_classes=8, vocab_size=17,
                      embed_size=8, hidden_size=8)
    rng = np.random.RandomState(7)
    B, T = 16, 3
    batch = {
        "v_features": rng.randn(B, T, 10, 13, CFG.num_input_channels)
                         .astype(np.float32),
        "question": rng.randint(1, CFG.vocab_size, size=(B, 7)).astype(np.int32),
        "v_len": np.full((B,), T, np.int32),
        "q_len": np.full((B,), 4, np.int32),
        "label": rng.randint(0, CFG.num_classes, size=(B,)).astype(np.int32),
    }
    model = get_model(CFG.model)
    params, state = model.init(jax.random.PRNGKey(0), CFG)
    optimizer = make_optimizer(1e-3)
    opt_state = optimizer.init(params)
    step = make_train_step(model, CFG, optimizer, reduction="sum",
                           clip_value=1.0, donate=False)
    params, state, opt_state, metrics = step(params, state, opt_state, batch,
                                             jax.random.PRNGKey(5))
    loss, gn = float(metrics["loss"]), float(metrics["grad_norm"])
    leafsum = float(np.asarray(jax.tree.leaves(params)[0]).sum())

    np.testing.assert_allclose(results[0][0], loss, rtol=1e-5)
    np.testing.assert_allclose(results[0][1], gn, rtol=1e-4)
    np.testing.assert_allclose(results[0][2], leafsum, rtol=1e-4, atol=1e-5)


MP2_WORKER = os.path.join(REPO, "tests", "_mp_cli_mp2_worker.py")


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_two_process_model_parallel_checkpoint_cycle(tmp_path):
    """Multi-host model parallelism end-to-end: 2 processes x 4 devices with
    --model_parallel 2 ('model'-sharded leaves span hosts), full checkpoint
    cycle (collective all-gather save -> restore -> re-shard -> train on),
    matching a single-process run of the identical config."""
    from videonavqa_tpu.data.synthetic import generate_synthetic_dataset

    base = str(tmp_path / "mp2cli")
    generate_synthetic_dataset(base, num_houses=3, trajs_per_house=8, seed=11,
                               video_format="npy", max_frames=8)

    port = _free_port()
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [subprocess.Popen([sys.executable, MP2_WORKER, str(pid), str(port), base],
                              stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                              text=True, env=env, cwd=REPO)
             for pid in (0, 1)]
    outs = [p.communicate(timeout=1200)[0] for p in procs]
    res = []
    for pid, out in enumerate(outs):
        assert procs[pid].returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
        m = re.search(r"CLIMP2 pid=\d+ live0=(-?[\d.]+) ck0=(-?[\d.]+) "
                      r"final=(-?[\d.]+)", out)
        assert m, f"no result line from worker {pid}:\n{out[-3000:]}"
        res.append(tuple(float(g) for g in m.groups()))

    assert res[0] == res[1], res  # hosts agree on all global quantities
    live0, ck0, final = res[0]
    # checkpoint round-trip of the cross-host-sharded params is exact
    np.testing.assert_allclose(ck0, live0, rtol=1e-6)

    # single-process reference: same config, same checkpoint/restore cycle
    from videonavqa_tpu.cli.common import build_q_and_v_parser, run_training
    from videonavqa_tpu.utils.checkpoint import epoch_path

    ckpt_path = str(tmp_path / "sp_ckpt.npz")
    common = [
        "--data_dir", base, "--model", "film_gp_pt", "--batch_size", "8",
        "--num_res_blocks", "1", "--num_res_block_channels", "16",
        "--num_tail_channels", "4", "--embed_size", "8", "--hidden_size", "8",
        "--compute_dtype", "float32", "--feature_cache", "true",
        "--mesh_devices", "8", "--model_parallel", "2",
    ]
    args = build_q_and_v_parser().parse_args(
        common + ["--num_epochs", "1", "--checkpoint_path", ckpt_path])
    run_training(args, "film_gp_pt")
    args2 = build_q_and_v_parser().parse_args(
        common + ["--num_epochs", "1",
                  "--checkpoint_path", epoch_path(ckpt_path, 0)])
    params_sp, _ = run_training(args2, "film_gp_pt")
    ref = sum(float(np.asarray(l).sum()) for l in jax.tree.leaves(params_sp))
    np.testing.assert_allclose(final, ref, atol=5e-3)


def test_expect_multiprocess_fails_fast_on_silent_degradation():
    """--distributed with auto-detect that resolves to ONE process must raise,
    not silently run N independent single-host trainings (parallel/
    multihost.py). Fresh subprocess: jax.distributed state is global."""
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "from videonavqa_tpu.parallel import multihost\n"
        "multihost.initialize(None, 1, None, expect_multiprocess=True)\n"
        "print('EXPLICIT-SINGLE-OK')\n"
        "try:\n"
        "    multihost.initialize(None, None, None, expect_multiprocess=True)\n"
        "    print('NO-ERROR')\n"
        "except RuntimeError as e:\n"
        "    print('DEGRADATION-CAUGHT' if 'train alone' in str(e) else repr(e))\n"
    )
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    out = subprocess.run([sys.executable, "-c", code], text=True, env=env,
                         cwd=REPO, capture_output=True, timeout=120)
    assert "EXPLICIT-SINGLE-OK" in out.stdout, out.stdout + out.stderr
    assert "DEGRADATION-CAUGHT" in out.stdout, out.stdout + out.stderr


CLI_WORKER = os.path.join(REPO, "tests", "_mp_cli_worker.py")


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_two_process_cli_training_matches_single_process(tmp_path):
    """The user-facing harness under jax.distributed: 2 processes x 4 CPU
    devices run run_training (--distributed --mesh_devices 8, feature-cache
    row_slice loaders), must agree with each other AND with a single-process
    run of the same config."""
    from videonavqa_tpu.data.synthetic import generate_synthetic_dataset

    base = str(tmp_path / "mpcli")
    generate_synthetic_dataset(base, num_houses=3, trajs_per_house=8, seed=11,
                               video_format="npy", max_frames=8)

    port = _free_port()
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [subprocess.Popen([sys.executable, CLI_WORKER, str(pid), str(port), base],
                              stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                              text=True, env=env, cwd=REPO)
             for pid in (0, 1)]
    outs = [p.communicate(timeout=820)[0] for p in procs]
    sums = []
    for pid, out in enumerate(outs):
        assert procs[pid].returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
        m = re.search(r"CLIMP pid=\d+ leafsum=(-?[\d.]+)", out)
        assert m, f"no result line from worker {pid}:\n{out[-3000:]}"
        sums.append(float(m.group(1)))
    assert sums[0] == sums[1], sums  # identical replicated params on both hosts

    # single-process reference run of the same config on the same dataset
    from videonavqa_tpu.cli.common import build_q_and_v_parser, run_training

    args = build_q_and_v_parser().parse_args([
        "--data_dir", base, "--model", "film_gp_pt", "--batch_size", "8",
        "--num_res_blocks", "1", "--num_res_block_channels", "16",
        "--num_tail_channels", "4", "--embed_size", "8", "--hidden_size", "8",
        "--num_epochs", "1", "--compute_dtype", "float32",
        "--feature_cache", "true",
    ])
    params, _ = run_training(args, "film_gp_pt")
    ref = sum(float(np.asarray(l).sum()) for l in jax.tree.leaves(params))
    np.testing.assert_allclose(sums[0], ref, atol=5e-3)
