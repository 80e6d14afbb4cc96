"""predict CLI, detector training harness, and the .pt export round-trip."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def gen_dir(tmp_path_factory):
    from videonavqa_tpu.cli import generate_dataset

    out = str(tmp_path_factory.mktemp("gen"))
    generate_dataset.main(["--out", out, "--num_houses", "2",
                           "--trajs_per_house", "2", "--seed", "3"])
    return out


def test_predict_cli(gen_dir, tmp_path, capsys):
    """Train one tiny epoch, then answer a real question about a real video."""
    import json

    from videonavqa_tpu.cli import predict, q_and_v_eval

    ckpt_path = str(tmp_path / "gp.ckpt")
    common = ["--model", "film_gp_pt", "--data_dir", gen_dir,
              "--batch_size", "2", "--num_res_blocks", "1",
              "--num_res_block_channels", "16", "--num_input_channels", "512",
              "--num_tail_channels", "4", "--compute_dtype", "float32"]
    q_and_v_eval.main(common + ["--num_epochs", "1", "--checkpoint_path", ckpt_path])
    capsys.readouterr()

    labels = json.load(open(os.path.join(gen_dir, "labels.json")))
    ex_id = sorted(labels)[0]
    questions = {}
    qdir = os.path.join(gen_dir, "questions")
    for f in os.listdir(qdir):
        data = json.load(open(os.path.join(qdir, f)))
        house = f.split(".")[0]
        for tid, entry in data.items():
            questions["%s_%04d" % (house, int(tid))] = entry["q_text"]

    predict.main(common + [
        "--checkpoint_path", str(tmp_path / "e0_gp.ckpt"),
        "--video", os.path.join(gen_dir, "videos", ex_id + ".mp4"),
        "--question", questions[ex_id]])
    out = capsys.readouterr().out
    assert "Answer:" in out


def test_train_obj_detector_and_pt_roundtrip(tmp_path, capsys):
    from videonavqa_tpu.cli import train_obj_detector

    pt_path = str(tmp_path / "obj_detect.pt")
    train_obj_detector.main([
        "--synthetic", "8", "--batch_size", "4", "--num_epochs", "1",
        "--num_filters", "16", "--tail_hidden_dim", "8",
        "--checkpoint_path", str(tmp_path / "det.ckpt"),
        "--export_pt", pt_path])
    out = capsys.readouterr().out
    assert "Epoch 0" in out
    assert os.path.exists(pt_path)

    # the exported .pt must round-trip through the reference-style importer
    from videonavqa_tpu.utils import torch_import as ti
    from videonavqa_tpu.stem import obj_detector
    from videonavqa_tpu.utils import checkpoint as ckpt
    from videonavqa_tpu.stem import init_obj_detector

    sd = ti.load_torch_state_dict(pt_path)
    params, state = ti.import_obj_detector(sd)
    tmpl_p, tmpl_s = init_obj_detector(jax.random.PRNGKey(0), nb_classes=27,
                                       num_filters=16, tail_hidden_dim=8)
    saved_p, saved_s, _, _ = ckpt.load_checkpoint(
        str(tmp_path / "det.ckpt"), params_template=tmpl_p, state_template=tmpl_s)

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 40, 52, 128))
    out1, _ = obj_detector(params, state, x, train=False, dtype=jnp.float32)
    out2, _ = obj_detector(saved_p, saved_s, x, train=False, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


def test_multihost_helpers():
    from videonavqa_tpu.parallel import make_mesh
    from videonavqa_tpu.parallel.multihost import (
        global_batch_from_host_shards, host_batch_slice,
    )

    start, size = host_batch_slice(16)
    assert (start, size) == (0, 16)  # single-process

    mesh = make_mesh(8)
    batch = {"x": np.arange(32, dtype=np.float32).reshape(16, 2)}
    out = global_batch_from_host_shards(mesh, batch)
    np.testing.assert_array_equal(np.asarray(out["x"]), batch["x"])


def test_await_artifacts_ignores_stale_failure_sentinel(tmp_path, monkeypatch):
    """A .failed sentinel left by a PREVIOUS run must not abort a healthy
    restart's waiting hosts (process 0 clears it only after minutes of stem
    hashing); a sentinel written during THIS run still fails fast."""
    import os
    import time

    import pytest as _pytest

    from videonavqa_tpu.cli import common

    monkeypatch.setattr(common.jax, "process_index", lambda: 1)
    art = str(tmp_path / "features_train.fnr")
    sentinel = common._failure_sentinel(art)
    with open(sentinel, "w") as f:
        f.write("RuntimeError: crash from a previous run")
    stale = common._RUN_START - 600
    os.utime(sentinel, (stale, stale))

    t0 = time.time()
    with _pytest.raises(TimeoutError):  # keeps waiting, ignores stale marker
        common._await_artifacts([art], timeout=1.5)
    assert time.time() - t0 >= 1.4

    with open(sentinel, "w") as f:  # fresh mtime == this run's failure
        f.write("RuntimeError: boom")
    with _pytest.raises(RuntimeError, match="boom"):
        common._await_artifacts([art], timeout=30)
