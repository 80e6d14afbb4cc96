"""CLI-level data parallelism: --mesh_devices wires GSPMD DP into the user
harness (run_training/run_test), not just the library. Trains the same tiny
config single-device and on a 4-device mesh and requires matching params.
"""

import os

import numpy as np
import pytest

import jax

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")

from videonavqa_tpu.cli.common import build_q_and_v_parser, run_training
from videonavqa_tpu.data.synthetic import generate_synthetic_dataset


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    base = str(tmp_path_factory.mktemp("clidp"))
    generate_synthetic_dataset(base, num_houses=3, trajs_per_house=4, seed=5,
                               video_format="npy", max_frames=20)
    return base


def _train(base, extra):
    args = build_q_and_v_parser().parse_args([
        "--data_dir", base, "--model", "film_gp_pt", "--batch_size", "4",
        "--num_res_blocks", "1", "--num_res_block_channels", "16",
        "--num_tail_channels", "4", "--embed_size", "8", "--hidden_size", "8",
        "--num_epochs", "1", "--compute_dtype", "float32",
        "--feature_cache", "true",  # also covers cache + DP integration
    ] + extra)
    return run_training(args, "film_gp_pt")


def test_cli_dp_matches_single_device(synth):
    p1, s1 = _train(synth, ["--mesh_devices", "0"])
    p2, s2 = _train(synth, ["--mesh_devices", "4"])
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-3)
    for a, b in zip(jax.tree.leaves(s1), jax.tree.leaves(s2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_cli_dp_with_model_parallel_runs(synth):
    p, s = _train(synth, ["--mesh_devices", "4", "--model_parallel", "2"])
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(p))


def test_cli_q_only_mesh_runs(synth, capsys):
    """q_only_eval has its own train loop — it must also place params on the
    mesh (shard_model) before sharded batches arrive."""
    from videonavqa_tpu.cli import q_only_eval

    q_only_eval.main([
        "--model", "bow", "--data_dir", synth, "--batch_size", "4",
        "--num_epochs", "2", "--stats_after_every", "1", "--l_rate", "1e-3",
        "--compute_dtype", "float32", "--mesh_devices", "4"])
    out = capsys.readouterr().out
    assert "Validation" in out


def test_cli_batch_not_divisible_errors(synth):
    with pytest.raises(SystemExit, match="divide"):
        _train(synth, ["--mesh_devices", "4", "--batch_size", "3"])
