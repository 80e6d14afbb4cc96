"""Length-mask helpers for the fixed-shape [B, T] world."""

from __future__ import annotations

import jax.numpy as jnp

from videonavqa_tpu.utils.constants import NEG_MASK_VALUE


def length_mask(lens, t: int):
    """[B, T] bool mask: position t valid iff t < len."""
    return jnp.arange(t)[None, :] < lens[:, None]


def attn_frame_mask(v_lens, t: int):
    """The reference's attention mask (models/film_attn_pt_stem.py:194-251):

    -2^31 where the frame is within the *batch's* processed range
    (t < max(v_lens)) but beyond the example's own length; 0 elsewhere — in
    particular frames beyond the batch max are NOT masked (the per-frame loop
    breaks before filling them), so they participate in attention with
    zero feature vectors. Returns [B, T] float.
    """
    t_idx = jnp.arange(t)[None, :]
    batch_max = jnp.max(v_lens)
    masked = (t_idx < batch_max) & (t_idx >= v_lens[:, None])
    return jnp.where(masked, NEG_MASK_VALUE, 0.0)


def mask_invalid(x, lens):
    """Zero positions t >= len of x: [B, T, ...]."""
    mask = length_mask(lens, x.shape[1])
    return jnp.where(mask.reshape(mask.shape + (1,) * (x.ndim - 2)), x, 0.0)
