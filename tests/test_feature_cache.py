"""Frozen-stem feature cache: container round-trip, parity with the online
stem, and harness integration (--feature_cache).

The cache (cli/extract_features.py) replaces the reference's per-batch stem
recompute (eval/q_and_v_eval.py:101-110): features for every raw frame are
stored bf16 in the VNR container, and the loader's per-(seed, example, epoch)
subsample pick is unchanged — so cached batches must reproduce the online
stem's features for the same frames.
"""

import os

import jax.numpy as jnp
import ml_dtypes
import numpy as np
import pytest

from videonavqa_tpu.data.synthetic import generate_synthetic_dataset
from videonavqa_tpu.data.vnr import (
    RecordWriter, VNRBatchLoader, ensure_built, pack_dataset,
)


@pytest.fixture(scope="module")
def packed_videos(tmp_path_factory):
    base = str(tmp_path_factory.mktemp("fcache"))
    generate_synthetic_dataset(base, num_houses=3, trajs_per_house=2, seed=3,
                               video_format="npy", max_frames=24)
    ensure_built()
    out = os.path.join(base, "train.vnr")
    ids = pack_dataset(base, out)
    return base, out, ids


def test_bf16_record_roundtrip(tmp_path):
    """bf16 payloads survive write -> native decode bit-exactly."""
    ensure_built()
    rng = np.random.RandomState(0)
    out = str(tmp_path / "feats.fnr")
    w = RecordWriter(out, (4, 5, 8), payload="bfloat16")
    frames_per_ex = []
    for i in range(3):
        t = 5 + 3 * i
        f = rng.randn(t, 4, 5, 8).astype(ml_dtypes.bfloat16)
        frames_per_ex.append(f)
        w.add(f, tokens=[1, 2, 3 + i], label=i, q_id=i)
    w.close()

    loader = VNRBatchLoader(out, batch_size=3, shuffle=False)
    assert loader.payload_key == "v_features"
    assert loader.frame_shape == (4, 5, 8)
    assert loader.elem_size == 2
    for i, f in enumerate(frames_per_ex):
        got = loader.example_frames(i)
        assert got.dtype == ml_dtypes.bfloat16
        np.testing.assert_array_equal(
            got.view(np.uint16), f.view(np.uint16))
        tokens, label, q_id = loader.example_meta(i)
        np.testing.assert_array_equal(tokens, [1, 2, 3 + i])
        assert (label, q_id) == (i, i)
    # batch path: subsampled picks land in the v_features key, zero-padded
    batch = next(iter(loader.epoch(0)))
    assert batch["v_features"].shape[2:] == (4, 5, 8)
    assert "video" not in batch
    loader.close()


def test_cached_features_match_online_stem(packed_videos):
    """extract_features over a packed split == the online stem on the very
    same subsampled frames (same seed/epoch -> same 1-of-4 picks)."""
    import argparse

    from videonavqa_tpu.cli.common import load_stem
    from videonavqa_tpu.cli.extract_features import extract_split
    from videonavqa_tpu.data.pipeline import DataPaths
    from videonavqa_tpu.ops.video import normalize_video

    base, vnr_path, ids = packed_videos
    # f32 stem on CPU (bf16 is emulated and slow there); the cache then
    # rounds once to bf16 storage, bounded below
    args = argparse.Namespace(data_dir=base, chunk=16, compress="zstd",
                              compute_dtype="float32")
    stem_fn = load_stem(args, DataPaths(base))
    out = extract_split(args, stem_fn, "train", ids)

    vloader = VNRBatchLoader(vnr_path, batch_size=len(ids), shuffle=False,
                             seed=11, deterministic=False)
    floader = VNRBatchLoader(out, batch_size=len(ids), shuffle=False,
                             seed=11, deterministic=False)
    for epoch in (0, 2):
        vb = next(iter(vloader.epoch(epoch)))
        fb = next(iter(floader.epoch(epoch)))
        np.testing.assert_array_equal(vb["v_len"], fb["v_len"])
        np.testing.assert_array_equal(vb["question"], fb["question"])
        np.testing.assert_array_equal(vb["label"], fb["label"])
        online = np.asarray(stem_fn(normalize_video(jnp.asarray(vb["video"]))),
                            dtype=np.float32)
        cached = np.asarray(fb["v_features"], dtype=np.float32)
        assert cached.shape == online.shape
        # cached = online rounded once to bf16 (plus any [1, chunk]-vs-[B, T]
        # fold reassociation) — bound by a bf16 ulp
        np.testing.assert_allclose(cached, online, rtol=0.01, atol=0.01)
        # padding frames stay zero
        for i in range(len(ids)):
            assert np.all(cached[i, fb["v_len"][i]:] == 0)
    vloader.close()
    floader.close()


def test_fp8_payload_roundtrip_and_forward(tmp_path):
    """float8_e4m3 feature files load with the right dtype and the step
    widens them in-graph; logits stay close to the bf16-cache path."""
    import jax

    from videonavqa_tpu.models import ModelConfig, get_model
    from videonavqa_tpu.train.step import make_eval_step

    ensure_built()
    rng = np.random.RandomState(1)
    B, T = 2, 4
    feats = (rng.rand(B, T, 10, 13, 512) * 4).astype(np.float32)

    out = str(tmp_path / "fp8.fnr")
    w = RecordWriter(out, (10, 13, 512), payload="float8_e4m3")
    for b in range(B):
        w.add(feats[b].astype(ml_dtypes.float8_e4m3fn), tokens=[1, 2],
              label=b, q_id=0)
    w.close()
    loader = VNRBatchLoader(out, batch_size=B, shuffle=False,
                            deterministic=True)
    assert loader.frame_dtype == ml_dtypes.float8_e4m3fn
    batch_np = next(iter(loader.epoch(0)))
    assert batch_np["v_features"].dtype == ml_dtypes.float8_e4m3fn

    cfg = ModelConfig(model="film_gp_pt", num_res_blocks=1,
                      num_res_block_channels=16, num_tail_channels=4,
                      embed_size=8, hidden_size=8, compute_dtype="float32")
    spec = get_model("film_gp_pt")
    params, state = spec.init(jax.random.PRNGKey(0), cfg)
    step = make_eval_step(spec, cfg)

    def run(v_feats):
        b = {"v_features": jnp.asarray(v_feats),
             "question": jnp.asarray(batch_np["question"]),
             "q_len": jnp.asarray(batch_np["q_len"]),
             "v_len": jnp.asarray(batch_np["v_len"]),
             "label": jnp.asarray(batch_np["label"])}
        return np.asarray(step(params, state, b, jax.random.PRNGKey(1))["logits"])

    fp8_logits = run(batch_np["v_features"])
    ref_logits = run(batch_np["v_features"].astype(np.float32))
    np.testing.assert_allclose(fp8_logits, ref_logits, rtol=1e-5, atol=1e-5)
    assert np.isfinite(fp8_logits).all()


def test_stale_cache_refused_and_rebuilt(packed_videos):
    """A cache whose recorded stem fingerprint doesn't match the current stem
    is never silently reused: detection across both provenance axes (weight
    files, compute_dtype), hard error without a stem, rebuild with one."""
    import argparse

    from videonavqa_tpu.cli.common import load_stem
    from videonavqa_tpu.cli.extract_features import (
        ensure_features, feature_file, features_needed, stem_fingerprint,
    )
    from videonavqa_tpu.data.pipeline import DataPaths, load_json
    from videonavqa_tpu.data.vnr import read_fingerprint

    base, _, ids = packed_videos
    paths = DataPaths(base)
    split_map = {"train": ids}
    args = argparse.Namespace(data_dir=base, chunk=16, compress="zstd",
                              compute_dtype="float32")
    out = feature_file(base, "train")
    stem_fn = load_stem(args, paths)
    files = ensure_features(args, stem_fn, ["train"], split_map)
    fp = stem_fingerprint(args, paths)
    assert read_fingerprint(files["train"]) == fp

    # current cache: accepted, and reusable without any stem at all
    assert features_needed(args, paths, ["train"]) == []
    mtime = os.path.getmtime(out)
    assert ensure_features(args, None, ["train"], split_map)["train"] == out
    assert os.path.getmtime(out) == mtime  # untouched

    # axis 1: different compute_dtype -> different stem -> stale
    args_b = argparse.Namespace(data_dir=base, chunk=16, compress="zstd",
                                compute_dtype="bfloat16")
    assert stem_fingerprint(args_b, paths) != fp
    assert features_needed(args_b, paths, ["train"]) == ["train"]
    with pytest.raises(ValueError, match="missing or stale"):
        ensure_features(args_b, None, ["train"], split_map)

    # axis 2: dropping in detector weights (the real obj_detect.pt scenario,
    # reference eval/utils.py:42-51) changes the fingerprint
    det = paths.obj_detector_file
    assert not os.path.exists(det)
    try:
        with open(det, "wb") as f:
            f.write(b"pretend these are torch weights")
        assert stem_fingerprint(args, paths) != fp
        assert features_needed(args, paths, ["train"]) == ["train"]
    finally:
        os.remove(det)

    # refuse-and-rebuild: a cache stamped by some *other* stem (simulated by
    # patching the v2 header fingerprint at offset 20) gets re-extracted and
    # re-stamped with the current stem's fingerprint
    with open(out, "r+b") as f:
        f.seek(20)
        f.write(b"some-other-stem!")
    assert read_fingerprint(out) != fp
    assert features_needed(args, paths, ["train"]) == ["train"]
    files = ensure_features(args, stem_fn, ["train"], split_map)
    assert read_fingerprint(files["train"]) == fp
    assert features_needed(args, paths, ["train"]) == []


def test_harness_feature_cache_end_to_end(packed_videos, tmp_path):
    """--feature_cache trains and tests the trunk without the stem."""
    from videonavqa_tpu.cli import q_and_v_eval, q_and_v_test

    base, _, _ = packed_videos
    ckpt = str(tmp_path / "fc_ckpt.npz")
    common = [
        "--data_dir", base, "--model", "film_gp_pt", "--batch_size", "2",
        "--num_res_blocks", "1", "--num_res_block_channels", "16",
        "--num_tail_channels", "4", "--embed_size", "8", "--hidden_size", "8",
        "--feature_cache", "true", "--compute_dtype", "float32",
    ]
    q_and_v_eval.main(common + ["--num_epochs", "1", "--checkpoint_path", ckpt])
    assert os.path.exists(os.path.join(base, "features_train.fnr"))
    assert os.path.exists(os.path.join(base, "features_val.fnr"))
    from videonavqa_tpu.utils.checkpoint import epoch_path
    q_and_v_test.main(common + ["--checkpoint_path", epoch_path(ckpt, 0),
                                "--feature_dtype", "float8_e4m3"])
    assert os.path.exists(os.path.join(base, "features_test_fp8.fnr"))
