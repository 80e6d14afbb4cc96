"""Fused FiLM-attention tail kernel (Pallas TPU).

The film_attn model's 35-step attention-LSTM recurrence
(models/film_attn_pt_stem.py:283-295; models/film.py apply_film_attn) as one
kernel: per step it fuses score projection, phantom-corrected masked softmax
over frames, context reduction, and the LSTMCell update, with features,
weights and (h, c) pinned in VMEM for all 35 steps.

Inference/serving path; the training path keeps the XLA scan for autodiff.
VMEM at harness shapes (B=32, T<=35, A=128): features 573 KB + weights 0.3 MB.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_tail_kernel(feats_ref, scores_ref, mask_ref, w_hid_ref, b_hid_ref,
                      w_ih_ref, w_hh_ref, b_ref, hs_ref, *, num_steps,
                      n_phantom):
    B, T, A = feats_ref.shape
    w_hid = w_hid_ref[:, :]                   # [1, A]
    w_ih_t = jnp.transpose(w_ih_ref[:, :])    # [A, 4A]
    w_hh_t = jnp.transpose(w_hh_ref[:, :])    # [A, 4A]
    b = b_ref[:, :]                           # [1, 4A]
    sm = scores_ref[:, :] + mask_ref[:, :]    # [B, T]
    feats = feats_ref[:, :, :]

    def step(i, carry):
        h, c = carry
        # [B,A]x[A,1] matmuls hit a Mosaic multi_reduction limitation; use an
        # explicit VPU reduction for the rank-1 projection instead.
        v = jnp.sum(h * w_hid, axis=1, keepdims=True) + b_hid_ref[0, 0]
        logits = v + sm
        m = jnp.maximum(jnp.max(logits, axis=1, keepdims=True), v)
        e = jnp.exp(logits - m)
        denom = jnp.sum(e, axis=1, keepdims=True) + n_phantom * jnp.exp(v - m)
        coefs = e / denom                                   # [B, T]
        ctxt = jnp.sum(coefs[:, :, None] * feats, axis=1)   # [B, A]
        gates = (jnp.dot(ctxt, w_ih_t, preferred_element_type=jnp.float32)
                 + jnp.dot(h, w_hh_t, preferred_element_type=jnp.float32) + b)
        ii = jax.nn.sigmoid(gates[:, 0 * A:1 * A])
        ff = jax.nn.sigmoid(gates[:, 1 * A:2 * A])
        gg = jnp.tanh(gates[:, 2 * A:3 * A])
        oo = jax.nn.sigmoid(gates[:, 3 * A:4 * A])
        c = ff * c + ii * gg
        h = oo * jnp.tanh(c)
        hs_ref[i] = h
        return h, c

    zeros = jnp.zeros((B, A), jnp.float32)
    jax.lax.fori_loop(0, num_steps, step, (zeros, zeros))


def attn_tail_pallas(params, all_features, scores, mask, *, num_steps,
                     n_phantom, interpret=False):
    """all_features [B, T, A], scores/mask [B, T] -> hs [B, num_steps, A].

    params: fc_hidden_attn {'weight' [1, A], 'bias' [1]} and lstm_attn
    {'w_ih' [4A, A], 'w_hh' [4A, A], 'b_ih', 'b_hh' [4A]}.
    """
    B, T, A = all_features.shape
    cell = params["lstm_attn"]
    bias = (cell["b_ih"] + cell["b_hh"]).reshape(1, -1).astype(jnp.float32)

    kernel = functools.partial(
        _attn_tail_kernel, num_steps=num_steps, n_phantom=float(n_phantom))
    hs = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((num_steps, B, A), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(all_features.astype(jnp.float32), scores.astype(jnp.float32),
      mask.astype(jnp.float32),
      params["fc_hidden_attn"]["weight"].astype(jnp.float32),
      params["fc_hidden_attn"]["bias"].reshape(1, 1).astype(jnp.float32),
      cell["w_ih"].astype(jnp.float32), cell["w_hh"].astype(jnp.float32), bias)
    return jnp.moveaxis(hs, 0, 1)
