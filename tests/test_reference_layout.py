"""Reference-download drop-in fidelity: a dataset directory constructed in
the EXACT layout of the released VideoNavQA archive (reference
eval/dataset.py:57-106, eval/utils.py:6-16) — BGR mp4v videos, 1-based token
.npy files, labels.json / q_ids.json / split.json — must flow through
run_training, run_test and results_analysis unmodified. This is built by hand
here (NOT via our generator), proving the real archive would work as-is.
"""

import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from videonavqa_tpu.utils import constants as C  # noqa: E402


def _build_reference_layout(base, rng):
    """8 examples exactly as the download ships them."""
    os.makedirs(os.path.join(base, "videos"))
    os.makedirs(os.path.join(base, "encoded_questions"))
    names = [f"house{h:05d}_{t:04d}" for h in range(4) for t in range(2)]
    labels, q_ids = {}, {}
    for i, name in enumerate(names):
        # mp4v BGR video at the reference geometry, ragged raw lengths
        t_raw = 8 + 3 * (i % 3)
        vw = cv2.VideoWriter(
            os.path.join(base, "videos", name + ".mp4"),
            cv2.VideoWriter_fourcc(*"mp4v"), 30.0, (C.VID_WIDTH, C.VID_HEIGHT))
        assert vw.isOpened()
        for _ in range(t_raw):
            vw.write(rng.randint(0, 256, (C.VID_HEIGHT, C.VID_WIDTH, 3),
                                 dtype=np.uint8))
        vw.release()
        # encoded question: 1-based token ids, int64, ragged length
        # (datagen writes exactly this; the archive's vocab has 134 entries)
        q_len = 4 + i % 5
        tokens = rng.randint(1, 100, size=(q_len,)).astype(np.int64)
        np.save(os.path.join(base, "encoded_questions", name + ".npy"), tokens)
        labels[name] = int(rng.randint(0, C.NUM_CLASSES))
        q_ids[name] = int(rng.randint(0, 29))
    with open(os.path.join(base, "labels.json"), "w") as f:
        json.dump(labels, f)
    with open(os.path.join(base, "q_ids.json"), "w") as f:
        json.dump(q_ids, f)
    with open(os.path.join(base, "split.json"), "w") as f:
        json.dump({"train": names[:4], "val": names[4:6], "test": names[6:]}, f)
    return names


def test_reference_layout_drop_in(tmp_path, capsys):
    from videonavqa_tpu.cli import q_and_v_eval, q_and_v_test, results_analysis
    from videonavqa_tpu.utils.checkpoint import epoch_path

    base = str(tmp_path / "data")
    os.makedirs(base)
    names = _build_reference_layout(base, np.random.RandomState(0))

    ckpt = str(tmp_path / "ref_ckpt.npz")
    common = [
        "--data_dir", base, "--model", "film_gp_pt", "--batch_size", "2",
        "--num_res_blocks", "1", "--num_res_block_channels", "16",
        "--num_tail_channels", "4", "--embed_size", "8", "--hidden_size", "8",
        "--compute_dtype", "float32",
    ]
    q_and_v_eval.main(common + ["--num_epochs", "1",
                                "--checkpoint_path", ckpt])
    e0 = epoch_path(ckpt, 0)
    assert os.path.exists(e0)

    q_and_v_test.main(common + ["--checkpoint_path", e0])
    # the reference-style t_/p_/q_ dumps appear next to the checkpoint
    d = os.path.dirname(e0)
    stem = os.path.basename(e0)
    for prefix in ("t_", "p_", "q_"):
        assert os.path.exists(os.path.join(d, prefix + stem + ".npy")), prefix
    t = np.load(os.path.join(d, "t_" + stem + ".npy"))
    p = np.load(os.path.join(d, "p_" + stem + ".npy"))
    qd = np.load(os.path.join(d, "q_" + stem + ".npy"))
    assert t.shape == p.shape == qd.shape == (2,)  # the 2 test examples

    capsys.readouterr()
    results_analysis.main(["--checkpoint_path", e0])
    out = capsys.readouterr().out
    assert "accuracy" in out.lower() or "%" in out
