"""Native VNR loader: pack -> C++ batch assembly parity with the Python path."""

import os

import numpy as np
import pytest

from videonavqa_tpu.data import DataPaths, VNQADataset, load_json
from videonavqa_tpu.data.synthetic import generate_synthetic_dataset
from videonavqa_tpu.data.vnr import VNRBatchLoader, ensure_built, pack_dataset
from videonavqa_tpu.utils import constants as C


@pytest.fixture(scope="module", params=["zstd", "zlib", "raw"])
def packed(request, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("vnrdata"))
    generate_synthetic_dataset(base, num_houses=2, trajs_per_house=3, seed=1,
                               video_format="npy", max_frames=50)
    ensure_built()
    out = os.path.join(base, f"all_{request.param}.vnr")
    ids = pack_dataset(base, out, compress=request.param)
    return base, out, ids


def test_pack_and_lengths(packed):
    base, out, ids = packed
    loader = VNRBatchLoader(out, batch_size=2, shuffle=False)
    assert loader.n == len(ids)
    # lengths match ceil(frames/4)
    paths = DataPaths(base)
    for i, ex_id in enumerate(ids):
        raw = np.load(os.path.join(paths.videos_dir, ex_id + ".npy"))
        assert loader._lengths[i] == min(-(-raw.shape[0] // 4), 35)
    loader.close()


def test_batch_contents_match_python_loader(packed):
    base, out, ids = packed
    paths = DataPaths(base)
    labels = load_json(paths.labels_file)
    ds = VNQADataset(paths, ids, labels, deterministic=True, q_metadata=True)

    loader = VNRBatchLoader(out, batch_size=len(ids), shuffle=False,
                            deterministic=True)
    batch = next(iter(loader.epoch(0)))
    assert batch["video"].shape == (len(ids), 35, C.VID_HEIGHT, C.VID_WIDTH, 3)

    for i, ex_id in enumerate(ids):
        ex = ds.load_example(i)
        # question/label/q_id exact
        np.testing.assert_array_equal(batch["question"][i], ex["question"])
        assert batch["q_len"][i] == ex["q_len"]
        assert batch["label"][i] == ex["label"]
        assert batch["q_id"][i] == ex["q_id"]
        assert batch["v_len"][i] == ex["v_len"]
        # frames: same bucket structure (exact frame choice differs — C++ and
        # numpy use different RNGs — but every kept frame must be a real frame
        # from the right bucket)
        raw = np.load(os.path.join(paths.videos_dir, ex_id + ".npy"))
        for t in range(batch["v_len"][i]):
            bucket = raw[t * 4: min((t + 1) * 4, raw.shape[0])]
            match = (bucket == batch["video"][i, t][None]).all(axis=(1, 2, 3))
            assert match.any(), f"frame {t} of {ex_id} not from its bucket"
        assert np.all(batch["video"][i, batch["v_len"][i]:] == 0)


def test_deterministic_and_epoch_varied_subsampling(packed):
    _, out, ids = packed
    det = VNRBatchLoader(out, batch_size=len(ids), shuffle=False, deterministic=True)
    b1 = next(iter(det.epoch(0)))
    b2 = next(iter(det.epoch(7)))
    np.testing.assert_array_equal(b1["video"], b2["video"])

    rnd = VNRBatchLoader(out, batch_size=len(ids), shuffle=False, deterministic=False)
    r1 = next(iter(rnd.epoch(0)))
    r2 = next(iter(rnd.epoch(7)))
    assert not np.array_equal(r1["video"], r2["video"])


def test_thread_count_invariance(packed):
    """Batch assembly must be deterministic regardless of thread-pool size
    (per-(seed, example, epoch) RNG, no cross-thread state)."""
    _, out, ids = packed
    batches = {}
    for nt in (1, 4, 8):
        loader = VNRBatchLoader(out, batch_size=len(ids), shuffle=False,
                                num_threads=nt, deterministic=True)
        batches[nt] = next(iter(loader.epoch(0)))
        loader.close()
    for nt in (4, 8):
        for k in ("video", "question", "v_len", "label"):
            np.testing.assert_array_equal(batches[1][k], batches[nt][k])


def test_row_slice_matches_full_batch(packed):
    """Multi-host feeding: per-host row_slice loaders must reproduce exactly
    the rows of the full-batch loader (same global order/t_cap/subsample)."""
    _, out, ids = packed
    B = len(ids)
    per = B // 2
    full = VNRBatchLoader(out, batch_size=B, shuffle=False, seed=4)
    parts = [VNRBatchLoader(out, batch_size=B, shuffle=False, seed=4,
                            row_slice=(i * per, per)) for i in range(2)]
    fb = next(iter(full.epoch(3)))
    pbs = [next(iter(p.epoch(3))) for p in parts]
    for k in ("video", "question", "v_len", "q_len", "label", "q_id"):
        got = np.concatenate([pb[k] for pb in pbs])
        np.testing.assert_array_equal(got, fb[k][: 2 * per])
    # test-mode: global padding rows land in the right host slice
    tfull = VNRBatchLoader(out, batch_size=B + 2, shuffle=False, mode="test")
    tparts = [VNRBatchLoader(out, batch_size=B + 2, shuffle=False, mode="test",
                             row_slice=(i * ((B + 2) // 2), (B + 2) // 2))
              for i in range(2)]
    gb = list(tfull.epoch(0))[-1]
    lbs = [list(p.epoch(0))[-1] for p in tparts]
    assert sum(int(b["num_valid"]) for b in lbs) == int(gb["num_valid"])
    got = np.concatenate([b["video"] for b in lbs])
    np.testing.assert_array_equal(got, gb["video"])
    for loader in [full, tfull] + parts + tparts:
        loader.close()


def test_bucketed_trimming_and_test_padding(packed):
    _, out, ids = packed
    loader = VNRBatchLoader(out, batch_size=2, shuffle=True, seed=3,
                            bucket_by_length=True, frame_buckets=True)
    for batch in loader.epoch(0):
        t_cap = batch["video"].shape[1]
        assert t_cap in loader.frame_buckets
        assert batch["v_len"].max() <= t_cap

    test_loader = VNRBatchLoader(out, batch_size=4, shuffle=False, mode="test")
    batches = list(test_loader.epoch(0))
    assert sum(int(b["num_valid"]) for b in batches) == len(ids)
    last = batches[-1]
    nv = int(last["num_valid"])
    if nv < 4:
        assert np.all(last["q_id"][nv:] == 35)
        assert np.all(last["v_len"][nv:] == 1)
