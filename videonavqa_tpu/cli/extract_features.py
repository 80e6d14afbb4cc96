"""Precompute frozen-stem features into a feature-cache .fnr file.

The reference recomputes the frozen VGG+detector stem on every batch of every
epoch (eval/q_and_v_eval.py:101-110, under torch.no_grad — the stem never
trains, eval/utils.py:42-51). Its features are therefore a pure function of
the pixels, and a TPU-sized fraction of the step: ~188 ms of the 483 ms
flagship train step (PERF.md). This CLI runs the stem ONCE over every raw
frame of a packed dataset and stores the [10, 13, 512] feature planes as
bf16 in the same VNR container the native loader reads (data/vnr.py); the
harnesses then train/eval the trunk only (--feature_cache), skipping the stem
every epoch while preserving the exact per-epoch random 1-of-4 temporal
subsampling (eval/dataset.py:80-89): the cache holds features for every raw
frame the subsampler can select, and the loader's deterministic
(seed, example, epoch) pick applies unchanged.

Storage is exact for the bf16-compute default: stem features are computed in
bf16 and cast to f32 (stem/obj_detector.py:133), so their bf16 bit patterns
round-trip losslessly. With --compute_dtype float32 the cache rounds each
feature once to bf16 (<=0.4% relative).

Usage:
    python -m videonavqa_tpu.cli.extract_features --data_dir data/ \
        --splits train,val,test [--frcnn_pretrained_path vgg16_caffe.pth]
"""

from __future__ import annotations

import argparse
import hashlib
import os
import time

import jax
import jax.numpy as jnp
import ml_dtypes
import numpy as np

from videonavqa_tpu.data.pipeline import DataPaths, load_json
from videonavqa_tpu.data.vnr import RecordWriter, VNRBatchLoader, ensure_built, pack_dataset
from videonavqa_tpu.ops.video import normalize_video
from videonavqa_tpu.utils import constants as C

FEATURE_SHAPE = (10, 13, 512)  # detector grid (models/base.py:13)


def feature_file(data_dir: str, split: str, feature_dtype: str = "bfloat16") -> str:
    tag = "_fp8" if feature_dtype == "float8_e4m3" else ""
    return os.path.join(data_dir, f"features_{split}{tag}.fnr")


#: bump when the stem computation itself changes incompatibly (feature
#: geometry, normalization, layer set) — invalidates every existing cache
_STEM_CODE_VERSION = b"stem-v1"


def _hash_file_into(h, path: str):
    with open(path, "rb") as f:
        while True:
            chunk = f.read(1 << 20)
            if not chunk:
                break
            h.update(chunk)


def stem_fingerprint(args, paths) -> bytes:
    """16-byte provenance hash of the exact stem a feature cache was (or would
    be) extracted with: the resolved VGG + detector weight files (content
    hash, or the seeded random-init marker when absent — load_stem's exact
    resolution rules, cli/common.py) plus the extraction compute_dtype.

    Stored in the .fnr header (v2) at extraction time; ensure_features
    refuses/rebuilds any cache whose recorded fingerprint differs, so swapping
    in real vgg16_caffe.pth / obj_detect.pt (the artifacts the reference
    trains on, eval/utils.py:42-51) or changing --compute_dtype can never
    silently reuse features from the wrong stem.

    Memoized on (resolved paths, mtime, size, dtype): startup calls it up to
    three times (features_needed twice + the header write), and each cold
    call re-hashes the full ~0.5 GB weight files on a single-core host."""
    frcnn_path = getattr(args, "frcnn_pretrained_path", None)
    vgg = frcnn_path if frcnn_path and os.path.exists(frcnn_path) else None
    det = (paths.obj_detector_file
           if os.path.exists(paths.obj_detector_file) else None)
    dtype = str(getattr(args, "compute_dtype", "bfloat16"))

    def sig(p):
        return (p, os.path.getmtime(p), os.path.getsize(p)) if p else None

    key = (sig(vgg), sig(det), dtype)
    if key in _FINGERPRINT_CACHE:
        return _FINGERPRINT_CACHE[key]
    h = hashlib.blake2b(digest_size=16)
    h.update(_STEM_CODE_VERSION)
    if vgg:
        h.update(b"vgg-file:")
        _hash_file_into(h, vgg)
    else:
        h.update(b"vgg-random:1234")  # load_stem's seeded init
    if det:
        h.update(b"det-file:")
        _hash_file_into(h, det)
    else:
        h.update(b"det-random:1234")
    h.update(b"dtype:" + dtype.encode())
    digest = h.digest()
    _FINGERPRINT_CACHE[key] = digest
    return digest


_FINGERPRINT_CACHE = {}


def features_needed(args, paths, splits, quiet=False) -> list:
    """Splits whose feature cache is missing OR stale (fingerprint mismatch vs
    the stem the current args resolve to). Legacy v1 caches (no recorded
    provenance) count as stale."""
    from videonavqa_tpu.data.vnr import read_fingerprint

    dtype = getattr(args, "feature_dtype", "bfloat16") or "bfloat16"
    want = stem_fingerprint(args, paths)
    needed = []
    for split in splits:
        out = feature_file(args.data_dir, split, dtype)
        if not os.path.exists(out):
            needed.append(split)
            continue
        have = read_fingerprint(out)
        if have != want:
            if not quiet:
                print(f"=> STALE feature cache {out}: recorded stem "
                      f"fingerprint "
                      f"{'(none, legacy v1)' if have is None else have.hex()}"
                      f" != current stem {want.hex()} — re-extracting so "
                      f"training never silently uses features from the "
                      f"wrong stem")
            needed.append(split)
    return needed


def make_stem_call(stem_fn, chunk: int, store_dtype):
    """jit a fixed-shape per-chunk stem: u8 [chunk,160,208,3] -> stored feats."""

    @jax.jit
    def call(frames_u8):
        # the caller pads every block to exactly `chunk` frames — one
        # compiled shape; a ragged block would silently recompile per length
        assert frames_u8.shape[0] == chunk, frames_u8.shape
        video = normalize_video(frames_u8[None])  # [1, chunk, H, W, 3]
        return stem_fn(video)[0].astype(store_dtype)

    return call


def extract_split(args, stem_fn, split: str, ids, fingerprint=None) -> str:
    """Extract one split's features; returns the output path. The stem
    fingerprint is recorded in the output header so later runs can detect a
    stale cache (stem_fingerprint)."""
    if fingerprint is None:
        fingerprint = stem_fingerprint(args, DataPaths(args.data_dir))
    src = os.path.join(args.data_dir, f"{split}.vnr")
    if not os.path.exists(src):
        print(f"=> Packing {split} split into {src}")
        pack_dataset(args.data_dir, src, ids)
    payload = getattr(args, "feature_dtype", "bfloat16") or "bfloat16"
    store_dtype = {"bfloat16": ml_dtypes.bfloat16,
                   "float8_e4m3": ml_dtypes.float8_e4m3fn}[payload]
    loader = VNRBatchLoader(src, 1, shuffle=False, mode="test")
    # adapt the fixed chunk shape to the split's actual max raw length so
    # short-video datasets don't pad every stem call up to 128 frames
    # (loader lengths are the subsampled ceil(t/4), so 4*max bounds raw t)
    max_raw = min(int(loader.lengths.max(initial=1)) * C.DROP_EVERY_N_FRAMES,
                  C.DROP_EVERY_N_FRAMES * C.MAX_ALLOWED_NUM_FRAMES_DROPPING)
    chunk = min(getattr(args, "chunk", 128), max(8, -(-max_raw // 8) * 8))
    out = feature_file(args.data_dir, split, payload)
    writer = RecordWriter(out, FEATURE_SHAPE, payload=payload,
                          compress=getattr(args, "compress", "zstd"),
                          fingerprint=fingerprint)
    call = make_stem_call(stem_fn, chunk, jnp.dtype(store_dtype))
    t0, n_frames = time.time(), 0
    with writer:
        for i in range(loader.n):
            frames = loader.example_frames(i)  # [T, 160, 208, 3] u8, T <= 140
            tokens, label, q_id = loader.example_meta(i)
            t = frames.shape[0]
            feats = []
            for s in range(0, t, chunk):
                block = frames[s:s + chunk]
                pad = chunk - block.shape[0]
                if pad:
                    block = np.concatenate(
                        [block, np.zeros((pad, *block.shape[1:]), block.dtype)])
                feats.append(np.asarray(call(jnp.asarray(block))))
            feats = np.concatenate(feats)[:t].astype(store_dtype)
            writer.add(feats, tokens, label, q_id)
            n_frames += t
            if (i + 1) % 50 == 0:
                print(f"   {split}: {i + 1}/{loader.n} examples "
                      f"({n_frames / (time.time() - t0):.0f} frames/s)")
    loader.close()
    print(f"=> Wrote {out} ({loader.n} examples, {n_frames} frames, "
          f"{os.path.getsize(out) / 1e6:.1f} MB, {time.time() - t0:.1f}s)")
    return out


def ensure_features(args, stem_fn, splits, split_map) -> dict:
    """Extract any missing-or-stale feature files; returns {split: path}.

    Staleness = the cache's recorded stem fingerprint differs from the stem
    the current args resolve to (different weight files, random vs pretrained,
    or a different --compute_dtype) — such caches are re-extracted, never
    silently reused. ``stem_fn`` may be None when every cache is current."""
    paths = DataPaths(args.data_dir)
    dtype = getattr(args, "feature_dtype", "bfloat16") or "bfloat16"
    needed = set(features_needed(args, paths, splits))
    if needed and stem_fn is None:
        raise ValueError(
            f"feature caches for splits {sorted(needed)} are missing or "
            f"stale but no stem was provided to re-extract them")
    fp = stem_fingerprint(args, paths)
    outs = {}
    for split in splits:
        if split in needed:
            print(f"=> Extracting frozen-stem features for split '{split}'")
            outs[split] = extract_split(args, stem_fn, split,
                                        split_map[split], fingerprint=fp)
        else:
            outs[split] = feature_file(args.data_dir, split, dtype)
    return outs


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    parser.add_argument("--data_dir", type=str, required=True)
    parser.add_argument("--splits", type=str, default="train,val,test")
    parser.add_argument("--frcnn_pretrained_path", type=str, default=None)
    parser.add_argument("--chunk", type=int, default=128,
                        help="frames per device call (fixed shape; 140-frame "
                             "videos take at most 2 calls)")
    parser.add_argument("--compress", type=str, default="zstd",
                        choices=["zstd", "zlib", "raw"])
    parser.add_argument("--feature_dtype", type=str, default="bfloat16",
                        choices=["bfloat16", "float8_e4m3"],
                        help="bf16 is lossless vs the bf16-compute stem; fp8 "
                             "halves disk + host->device bandwidth at ~3%% "
                             "per-element feature error (validate task "
                             "accuracy, see PERF.md)")
    parser.add_argument("--jax_cache_dir", type=str, default=None)
    args = parser.parse_args(argv)

    from videonavqa_tpu.cli.common import _maybe_enable_compile_cache, load_stem

    _maybe_enable_compile_cache(args)
    ensure_built()
    paths = DataPaths(args.data_dir)
    split_map = load_json(paths.split_file)
    stem_fn = load_stem(args, paths)
    for split in args.splits.split(","):
        extract_split(args, stem_fn, split, split_map[split])


if __name__ == "__main__":
    main()
