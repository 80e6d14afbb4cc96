"""Linear / embedding ops over torch-layout parameter dicts.

Weights are stored ``[out, in]`` (torch layout) so PyTorch checkpoints import
verbatim; the contraction is expressed with dot_general so XLA never
materializes a transpose.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def linear(params, x, *, dtype=None):
    """y = x @ W^T + b with W stored [out, in]. Batched over leading dims."""
    w = params["weight"]
    b = params.get("bias")
    if dtype is not None:
        x, w = x.astype(dtype), w.astype(dtype)
    y = jax.lax.dot_general(
        x, w,
        dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def linear_chw(params, x):
    """``linear(params, flatten_chw(x))`` without transposing the activation.

    The reference tails flatten conv activations in torch NCHW memory order
    before their Linear (e.g. models/film_attn_pt_stem.py:245,
    view(batch_size, -1) over a [B, C, H, W] tensor), so imported weights
    expect (C, H, W)-ordered features. Flattening channels-last activations
    that way is a physical transpose of the step's LARGEST tensor (~600 MB
    at the flagship batch-32 serving shape, measured 4.4 ms/step on v5e —
    scripts/flatten_probe.py). Contracting directly against the weight
    re-laid as [out, C, H, W] is mathematically identical (same dot
    products; accumulation order differs at ~1e-6 rel) and lets XLA
    transpose the 17M-param weight instead: 2.7-4x faster at that shape.

    x: [..., H, W, C]; weight: [out, C*H*W] (torch flatten order).
    """
    H, W, C = x.shape[-3:]
    w = params["weight"].reshape(-1, C, H, W)
    y = jnp.einsum("...hwc,ochw->...o", x, w,
                   preferred_element_type=jnp.float32)
    b = params.get("bias")
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def embedding(params, tokens, *, padding_idx: int | None = None):
    """Token embedding lookup; ``weight`` is [vocab, dim].

    ``padding_idx`` reproduces torch's nn.Embedding(padding_idx=...) semantics:
    the padding row's output is forced to the stored row value *and* receives no
    gradient. Because reference models keep the padding row at zero
    (e.g. models/q_only_bow.py:16), forcing the output to zero at padding
    positions gives identical forward values and identical (zero) gradients.

    Models whose embedding has no padding_idx (film_attn at
    models/film_attn_pt_stem.py:37; concat models) must pass None so padded
    positions look up the live row 0.
    """
    out = jnp.take(params["weight"], tokens, axis=0)
    if padding_idx is not None:
        keep = (tokens != padding_idx)[..., None]
        out = out * keep.astype(out.dtype)
    return out
