"""Data-driven frame-bucket selection (data/buckets.py).

The DP must be exactly optimal (checked against brute force), never worse
than the fixed default grid on its own histogram, and the "auto" spec must
flow through both loaders (Python BatchLoader and native VNRBatchLoader)
producing valid trims. The padding compute this removes is what the
reference skips on GPU with its effective-batch shrink loop
(eval/q_and_v_eval.py:96-110)."""

import itertools
import os

import numpy as np
import pytest

from videonavqa_tpu.data.buckets import (
    bucket_frame_cost, optimal_frame_buckets, resolve_frame_buckets,
)
from videonavqa_tpu.data.pipeline import BatchLoader


def _brute_force(lengths, k):
    vals = sorted(set(int(v) for v in lengths))
    best = None
    # max value must be an edge; choose up to k-1 more from the rest
    rest = vals[:-1]
    for r in range(0, min(k - 1, len(rest)) + 1):
        for combo in itertools.combinations(rest, r):
            b = tuple(sorted(combo + (vals[-1],)))
            c = bucket_frame_cost(lengths, b)
            if best is None or c < best[0]:
                best = (c, b)
    return best


@pytest.mark.parametrize("seed,k", [(0, 3), (1, 4), (2, 2), (3, 1), (4, 5)])
def test_optimal_matches_bruteforce(seed, k):
    rs = np.random.RandomState(seed)
    lengths = rs.randint(1, 36, size=60)
    got = optimal_frame_buckets(lengths, k=k)
    assert len(got) <= k
    best_cost, _ = _brute_force(lengths, k)
    assert bucket_frame_cost(lengths, got) == best_cost
    # every example must be covered (largest length is always an edge)
    assert got[-1] == int(lengths.max())


def test_few_distinct_lengths_returns_them_all():
    assert optimal_frame_buckets([7, 7, 12, 12, 3], k=8) == (3, 7, 12)


def test_never_worse_than_default_grid():
    default = BatchLoader.DEFAULT_FRAME_BUCKETS
    for seed in range(5):
        rs = np.random.RandomState(100 + seed)
        # skewed mix like real nav videos: mostly short, a long tail
        lengths = np.minimum(rs.geometric(0.08, size=200), 35)
        opt = optimal_frame_buckets(lengths, k=len(default))
        assert (bucket_frame_cost(lengths, opt)
                <= bucket_frame_cost(lengths, default))


def test_resolve_semantics():
    default = (8, 16, 35)
    lengths = [4, 4, 9, 35]
    assert resolve_frame_buckets(True, lambda: lengths, default) == default
    assert resolve_frame_buckets(None, lambda: lengths, default) is None
    assert resolve_frame_buckets(False, lambda: lengths, default) is None
    assert resolve_frame_buckets((5, 35), lambda: lengths, default) == (5, 35)
    auto = resolve_frame_buckets("auto", lambda: lengths, default, k=2)
    assert auto == optimal_frame_buckets(lengths, k=2)
    assert auto[-1] == 35


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    from videonavqa_tpu.data import DataPaths, VNQADataset, load_json
    from videonavqa_tpu.data.synthetic import generate_synthetic_dataset

    base = str(tmp_path_factory.mktemp("bucketdata"))
    generate_synthetic_dataset(base, num_houses=2, trajs_per_house=3, seed=5,
                               video_format="npy", max_frames=50)
    paths = DataPaths(base)
    split = load_json(paths.split_file)
    labels = load_json(paths.labels_file)
    ds = VNQADataset(paths, split["train"], labels, deterministic=True)
    return base, ds


def test_batchloader_auto_buckets(dataset):
    _, ds = dataset
    loader = BatchLoader(ds, batch_size=2, shuffle=True, num_workers=1,
                         bucket_by_length=True, frame_buckets="auto")
    lens = ds.subsampled_lengths()
    assert loader.frame_buckets == optimal_frame_buckets(lens)
    for batch in loader.epoch(0):
        assert batch["video"].shape[1] in loader.frame_buckets
        assert batch["v_len"].max() <= batch["video"].shape[1]


def test_cli_auto_buckets_trains(dataset):
    """--bucket_frames auto flows through the full harness (run_training)."""
    import jax

    from videonavqa_tpu.cli.common import build_q_and_v_parser, run_training

    base, _ = dataset
    args = build_q_and_v_parser().parse_args([
        "--data_dir", base, "--model", "film_gp_pt", "--batch_size", "4",
        "--num_res_blocks", "1", "--num_res_block_channels", "16",
        "--num_tail_channels", "4", "--embed_size", "8", "--hidden_size", "8",
        "--num_epochs", "1", "--compute_dtype", "float32",
        "--bucket_frames", "auto"])
    assert args.bucket_frames == "auto"
    params, _ = run_training(args, "film_gp_pt")
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(params))


def test_vnr_auto_buckets(dataset):
    from videonavqa_tpu.data.vnr import VNRBatchLoader, ensure_built, pack_dataset

    base, _ = dataset
    ensure_built()
    out = os.path.join(base, "auto.vnr")
    pack_dataset(base, out)
    loader = VNRBatchLoader(out, batch_size=2, shuffle=True, seed=3,
                            bucket_by_length=True, frame_buckets="auto")
    assert loader.frame_buckets == optimal_frame_buckets(loader._lengths)
    for batch in loader.epoch(0):
        assert batch["video"].shape[1] in loader.frame_buckets
        assert batch["v_len"].max() <= batch["video"].shape[1]
    loader.close()
