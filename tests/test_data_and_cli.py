"""Data pipeline + end-to-end CLI tests on a synthetic fixture."""

import json
import os

import numpy as np
import pytest

from videonavqa_tpu.data import BatchLoader, DataPaths, VNQADataset, load_json
from videonavqa_tpu.data.pipeline import subsample_frames
from videonavqa_tpu.data.synthetic import generate_synthetic_dataset
from videonavqa_tpu.utils import constants as C


@pytest.fixture(scope="module")
def synth_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("synth"))
    generate_synthetic_dataset(out, num_houses=3, trajs_per_house=4, seed=0,
                               video_format="mp4", max_frames=40)
    return out


def test_subsample_semantics():
    rng = np.random.RandomState(0)
    video = np.arange(10)[:, None, None, None] * np.ones((10, 2, 2, 3))
    video = video.astype(np.uint8)
    out, v_len = subsample_frames(video, rng)
    assert out.shape == (35, 2, 2, 3)
    assert v_len == 3  # ceil(10 / 4)
    # each kept frame comes from its own bucket
    for c, start in enumerate(range(0, 10, 4)):
        v = out[c, 0, 0, 0]
        assert start <= v < min(start + 4, 10)
    assert np.all(out[3:] == 0)


def test_subsample_rng_cross_process_stable():
    """Frame-subsampling RNG must not depend on PYTHONHASHSEED: spawn fresh
    interpreters with different hash seeds and require identical streams."""
    import subprocess
    import sys

    code = (
        "import numpy as np\n"
        "from videonavqa_tpu.data import DataPaths, VNQADataset\n"
        "ds = VNQADataset(DataPaths('.'), ['a.mp4'], {'a.mp4': 0},"
        " deterministic=True, seed=7)\n"
        "det = ds._rng_for('a.mp4', 3).randint(0, 1 << 30, 5)\n"
        "ds2 = VNQADataset(DataPaths('.'), ['a.mp4'], {'a.mp4': 0},"
        " deterministic=False, seed=7)\n"
        "tr = ds2._rng_for('a.mp4', 3).randint(0, 1 << 30, 5)\n"
        "print('|'.join(','.join(map(str, a)) for a in (det, tr)))\n"
    )
    outs = set()
    for hashseed in ("0", "12345"):
        env = dict(os.environ, PYTHONHASHSEED=hashseed)
        r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                           text=True, env=env, cwd="/root/repo")
        assert r.returncode == 0, r.stderr
        outs.add(r.stdout.strip().splitlines()[-1])
    assert len(outs) == 1, f"subsampling RNG varies across processes: {outs}"


def test_dataset_and_loader(synth_dir):
    paths = DataPaths(synth_dir)
    split = load_json(paths.split_file)
    labels = load_json(paths.labels_file)
    ds = VNQADataset(paths, split["train"], labels, deterministic=True)
    ex = ds.load_example(0)
    assert ex["video"].shape == (35, C.VID_HEIGHT, C.VID_WIDTH, 3)
    assert ex["video"].dtype == np.uint8
    assert 1 <= ex["v_len"] <= 35
    assert ex["question"].shape == (C.MAX_Q_LEN,)
    assert ex["q_len"] >= 1
    # determinism
    ex2 = ds.load_example(0, epoch=5)
    np.testing.assert_array_equal(ex["video"], ex2["video"])

    loader = BatchLoader(ds, batch_size=2, shuffle=True, num_workers=2, seed=1)
    batches = list(loader.epoch(0))
    assert len(batches) == len(ds) // 2
    b = batches[0]
    assert b["video"].shape == (2, 35, C.VID_HEIGHT, C.VID_WIDTH, 3)
    assert b["label"].dtype == np.int32

    # test mode pads the final batch
    test_loader = BatchLoader(ds, batch_size=5, shuffle=False, mode="test")
    tb = list(test_loader.epoch(0))
    assert sum(int(x["num_valid"]) for x in tb) == len(ds)
    assert all(x["label"].shape[0] == 5 for x in tb)


def test_q_only_cli_end_to_end(synth_dir, tmp_path, capsys):
    from videonavqa_tpu.cli import q_only_eval, q_only_test

    ckpt_path = str(tmp_path / "bow.ckpt")
    q_only_eval.main([
        "--model", "bow", "--data_dir", synth_dir, "--batch_size", "4",
        "--num_epochs", "2", "--stats_after_every", "1", "--l_rate", "1e-3",
        "--checkpoint_path", ckpt_path, "--num_workers", "2",
        "--compute_dtype", "float32"])
    out = capsys.readouterr().out
    assert "Train Epoch" in out and "Validation" in out
    assert os.path.exists(ckpt_path)

    q_only_test.main([
        "--model", "bow", "--data_dir", synth_dir, "--batch_size", "4",
        "--checkpoint_path", ckpt_path, "--num_workers", "2",
        "--compute_dtype", "float32"])
    out = capsys.readouterr().out
    assert "Testing" in out
    # t_/p_/q_ dumps for results_analysis
    d = str(tmp_path)
    for prefix in ["t_", "p_", "q_"]:
        assert os.path.exists(os.path.join(d, prefix + "bow.ckpt.npy"))

    from videonavqa_tpu.cli import results_analysis
    results_analysis.main(["--checkpoint_path", ckpt_path])
    out = capsys.readouterr().out
    assert ">>> Stats for" in out


def test_results_analysis_analyse():
    from videonavqa_tpu.cli.results_analysis import analyse

    yt = np.array([1, 2, 3, 4])
    yp = np.array([1, 2, 0, 4])
    q_ids = np.array([0, 0, 8, 28])
    res = analyse(yt, yp, q_ids)
    assert res["equals_attr"][0] == 2 and res["equals_attr"][1] == 2
    assert res["count"] == (0, 1, {8: (0, 1)})
    assert res["other"] == (1, 1, {28: (1, 1)})
