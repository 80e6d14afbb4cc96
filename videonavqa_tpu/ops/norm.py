"""Normalization layers: BatchNorm (torch semantics), per-frame masked BatchNorm,
LayerNorm.

The delicate piece is ``frame_batch_norm``: the reference applies BatchNorm2d
*per frame* to only the examples whose video is still running at that frame
(``v_features[:ct_batch_size]``, e.g. models/film_attn_pt_stem.py:203-211), so

- train-mode statistics are computed per frame over the *valid* examples only,
- running statistics receive one EMA update per processed frame, in frame order,
  and frames beyond the batch's max length are never processed.

On TPU we keep fixed [B, T, ...] shapes, compute all per-frame statistics in one
masked reduction, and reproduce the sequential EMA with its closed form
``r_K = (1-m)^K r_0 + m * sum_t (1-m)^(K-1-t) s_t``.
"""

from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-5
MOMENTUM = 0.1


def init_bn(c: int, dtype=jnp.float32):
    """BatchNorm parameters (affine) + state (running stats), torch defaults."""
    params = {"weight": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}
    state = {"mean": jnp.zeros((c,), dtype), "var": jnp.ones((c,), dtype)}
    return params, state


def batch_norm(params, state, x, *, train: bool, momentum: float = MOMENTUM):
    """Standard BatchNorm over all axes but the last (channels-last layouts).

    Matches torch.nn.BatchNorm{1,2,3}d: biased variance for normalization,
    unbiased for the running-stat EMA update.
    Returns (y, new_state).
    """
    x = x.astype(jnp.float32)  # stats and normalization in full precision
    axes = tuple(range(x.ndim - 1))
    if train:
        mean = jnp.mean(x, axis=axes)
        var = jnp.mean(jnp.square(x - mean), axis=axes)
        n = x.size // x.shape[-1]
        unbiased = var * (n / max(n - 1, 1))
        new_state = {
            "mean": (1 - momentum) * state["mean"] + momentum * mean,
            "var": (1 - momentum) * state["var"] + momentum * unbiased,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    y = (x - mean) * jnp.reciprocal(jnp.sqrt(var + EPS))
    return y * params["weight"] + params["bias"], new_state


def frame_batch_norm(params, state, x, frame_mask, *, train: bool, momentum: float = MOMENTUM):
    """Per-frame masked BatchNorm for [B, T, H, W, C] inputs.

    ``frame_mask`` is [B, T] bool (frame t of example b is a real frame).
    Train mode computes frame-t statistics over valid examples x H x W only and
    folds per-frame EMA updates (frames t < max valid length, in order) into the
    running stats. Eval mode applies running stats everywhere.

    Output values at invalid (b, t) positions are normalized with that frame's
    valid-statistics (garbage but finite); callers mask them downstream, exactly
    where the reference zero-pads (models/film_attn_pt_stem.py:245-247).
    """
    x = x.astype(jnp.float32)  # stats and normalization in full precision
    B, T = x.shape[:2]
    if not train:
        y = (x - state["mean"]) * jnp.reciprocal(jnp.sqrt(state["var"] + EPS))
        return y * params["weight"] + params["bias"], state

    m = frame_mask.astype(x.dtype)[:, :, None, None, None]  # [B,T,1,1,1]
    spatial = x.shape[2] * x.shape[3]
    count = jnp.sum(frame_mask.astype(x.dtype), axis=0) * spatial  # [T]
    safe = jnp.maximum(count, 1.0)
    # Per-frame masked mean/var over (B, H, W): -> [T, C]
    mean = jnp.sum(x * m, axis=(0, 2, 3)) / safe[:, None]
    var = jnp.sum(jnp.square(x - mean[None, :, None, None, :]) * m, axis=(0, 2, 3)) / safe[:, None]

    y = (x - mean[None, :, None, None, :]) * jnp.reciprocal(
        jnp.sqrt(var[None, :, None, None, :] + EPS))
    y = y * params["weight"] + params["bias"]

    # Sequential EMA over processed frames (t < K where K = max #valid frames).
    lens = jnp.sum(frame_mask, axis=1)  # [B]
    K = jnp.max(lens).astype(x.dtype)  # number of frames the reference processes
    t_idx = jnp.arange(T, dtype=x.dtype)
    processed = (t_idx < K).astype(x.dtype)
    decay = jnp.power(1.0 - momentum, jnp.maximum(K - 1.0 - t_idx, 0.0)) * processed
    w = momentum * decay  # [T]
    unbiased = var * (safe / jnp.maximum(safe - 1.0, 1.0))[:, None]
    new_state = {
        "mean": jnp.power(1.0 - momentum, K) * state["mean"] + jnp.sum(w[:, None] * mean, axis=0),
        "var": jnp.power(1.0 - momentum, K) * state["var"] + jnp.sum(w[:, None] * unbiased, axis=0),
    }
    return y, new_state


def init_layer_norm(c: int, dtype=jnp.float32):
    return {"weight": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}


def layer_norm(params, x, *, eps: float = EPS):
    """torch.nn.LayerNorm over the last dim (models/time_multi_hop_pt_stem.py:46,51)."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    y = (x - mean) * jnp.reciprocal(jnp.sqrt(var + eps))
    return y * params["weight"] + params["bias"]
