"""Data-driven frame-bucket selection for length-bucketed trimming.

Length-bucketed frame trimming (``BatchLoader.frame_buckets``) trims each
batch's time axis to the smallest bucket >= the batch's max v_len; with
length-sorted batching the per-example compute is ~ the bucket its own
length lands in. The fixed ``DEFAULT_FRAME_BUCKETS`` grid is tuned for the
roughly-uniform synthetic length mix; real datasets have their own length
histograms, so :func:`optimal_frame_buckets` instead picks the K bucket
edges that minimize total computed frames for the dataset's OWN lengths —
a small exact DP (O(m^2 k) over m <= 35 distinct lengths).

The padding compute this removes is what the reference skips on GPU with
its effective-batch shrink loop (eval/q_and_v_eval.py:96-110); the bucket
count K bounds the number of XLA recompiles exactly like the default grid.
"""

from __future__ import annotations

import numpy as np

#: matches BatchLoader.DEFAULT_FRAME_BUCKETS' size — 8 buckets keeps the
#: per-model compile count small while capturing most of the trim win.
DEFAULT_NUM_BUCKETS = 8


def bucket_frame_cost(lengths, buckets) -> int:
    """Total frames computed when each example is padded up to the smallest
    bucket >= its length (the length-pure-batch model of trimming cost).
    Lengths above every bucket fall back to their own length (the loaders
    fall back to the full container in that case)."""
    lengths = np.asarray(lengths)
    buckets = np.asarray(sorted(buckets))
    idx = np.searchsorted(buckets, lengths, side="left")
    padded = np.where(idx < len(buckets),
                      buckets[np.minimum(idx, len(buckets) - 1)], lengths)
    return int(padded.sum())


def optimal_frame_buckets(lengths, k: int = DEFAULT_NUM_BUCKETS):
    """Exact minimum-cost bucket set for ``lengths`` with at most ``k``
    buckets, by dynamic programming over the distinct length values.

    Bucket edges are always drawn from the observed lengths (an edge between
    two observed values is never better than lowering it to the largest
    observed value it covers), and the largest observed length is always an
    edge, so every example maps to a bucket. Returns an ascending tuple.
    """
    lengths = np.asarray(lengths)
    if lengths.size == 0:
        raise ValueError("optimal_frame_buckets needs at least one length")
    if k < 1:
        raise ValueError(f"need k >= 1 buckets, got {k}")
    vals, counts = np.unique(lengths, return_counts=True)
    m = len(vals)
    if m <= k:
        return tuple(int(v) for v in vals)

    prefix = np.concatenate([[0], np.cumsum(counts)])  # prefix[j] = count of vals[:j]
    INF = float("inf")
    # f[r][j] = min cost covering vals[:j] with r buckets, vals[j-1] an edge
    f = np.full((k + 1, m + 1), INF)
    back = np.zeros((k + 1, m + 1), dtype=np.int64)
    f[0][0] = 0.0
    for r in range(1, k + 1):
        for j in range(r, m + 1):
            # bucket r covers vals[i:j], padded up to vals[j-1]
            cand = f[r - 1][:j] + float(vals[j - 1]) * (prefix[j] - prefix[:j])
            i = int(np.argmin(cand))
            f[r][j], back[r][j] = cand[i], i
    # extra buckets never hurt, but ties can leave f[k][m] == f[r][m] for
    # r < k — prefer the smallest bucket set (fewest compiles) at equal cost
    r = int(np.argmin(f[:, m]))
    edges = []
    j = m
    while r > 0:
        edges.append(int(vals[j - 1]))
        j = int(back[r][j])
        r -= 1
    return tuple(sorted(edges))


def resolve_frame_buckets(spec, lengths_fn, default, k: int = DEFAULT_NUM_BUCKETS):
    """Map a loader's ``frame_buckets`` argument to a concrete bucket tuple.

    ``spec`` is what the caller passed: ``True`` -> ``default`` grid,
    ``"auto"`` -> :func:`optimal_frame_buckets` over ``lengths_fn()``
    (post-subsample v_lens), any other truthy value is taken verbatim as an
    explicit bucket iterable, falsy -> ``None`` (no trimming)."""
    if spec is True:
        return default
    if spec == "auto":
        return optimal_frame_buckets(lengths_fn(), k=k)
    return tuple(spec) if spec else None
