"""Fused FiLM question re-encode kernel (Pallas TPU).

The FiLM generators re-encode the question once PER FRAME with carried LSTM
state — the film_hidden drift quirk (reference
models/film_attn_pt_stem.py:154-171; models/film.py film_values_over_frames).
That is num_frames * max_q_len (35 * 56 = 1960) sequential cell steps, each a
[B, H] x [H, 4H] matmul — at batch 1 the dominant serving cost of the FiLM
generator, dispatch- and HBM-round-trip-bound as a nested ``lax.scan``.

This kernel runs the ENTIRE double recurrence in one ``pallas_call``: the
token projections (hoisted — identical for every frame), recurrent weights
and (h, c) stay VMEM-resident for all 1960 steps; only the per-frame final
hidden states [num_frames, B, H] are written out (the packed-sequence
``last_valid`` output equals the frozen carry, so no per-token outputs are
needed, unlike lstm_pallas).

Serving path only (flag-gated via cfg.use_pallas_kernels; training keeps the
XLA scan for autodiff). VMEM at harness shapes (B=32, Tq=56, H=128): xw
3.7 MB + finals 0.6 MB + weights 0.3 MB.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from videonavqa_tpu.ops.linear import linear as _linear


def _reencode_kernel(xw_ref, w_hh_ref, b_hh_ref, lens_ref, finals_ref, *,
                     num_frames):
    T, B, H4 = xw_ref.shape
    H = H4 // 4
    w_hh_t = jnp.transpose(w_hh_ref[:, :])  # [H, 4H]
    b_hh = b_hh_ref[:, :]                   # [1, 4H]
    lens = lens_ref[:, :]                   # [B, 1]

    def token(t, carry):
        h, c = carry
        gates = (xw_ref[t]
                 + jnp.dot(h, w_hh_t, preferred_element_type=jnp.float32)
                 + b_hh)
        i = jax.nn.sigmoid(gates[:, 0 * H:1 * H])
        f = jax.nn.sigmoid(gates[:, 1 * H:2 * H])
        g = jnp.tanh(gates[:, 2 * H:3 * H])
        o = jax.nn.sigmoid(gates[:, 3 * H:4 * H])
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        valid = t < lens  # [B, 1] packed-sequence mask; carry freezes at len
        return jnp.where(valid, h_new, h), jnp.where(valid, c_new, c)

    def frame(fi, carry):
        h, c = jax.lax.fori_loop(0, T, token, carry)
        finals_ref[fi] = h  # == last_valid(outs): frozen h at t = len - 1
        return h, c

    zeros = jnp.zeros((B, H), jnp.float32)
    jax.lax.fori_loop(0, num_frames, frame, (zeros, zeros))


def film_reencode_pallas(encoder_params, emb, q_lens, num_frames, *,
                         interpret=False):
    """emb [B, Tq, E], q_lens [B] -> per-frame final encodings [B, F, H].

    Semantically identical to the XLA path in
    models/film.film_values_over_frames: F chained masked-LSTM passes over the
    same embedded question, h0 = c0 = 0, each pass's ``last_valid`` output
    collected and the (frozen) carry feeding the next pass.
    """
    B, T, _ = emb.shape
    H = encoder_params["w_hh"].shape[1]
    xw = _linear({"weight": encoder_params["w_ih"],
                  "bias": encoder_params["b_ih"]}, emb)  # one MXU matmul
    xw_t = jnp.moveaxis(xw, 1, 0).astype(jnp.float32)    # [Tq, B, 4H]

    kernel = functools.partial(_reencode_kernel, num_frames=int(num_frames))
    finals = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((int(num_frames), B, H), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xw_t, encoder_params["w_hh"].astype(jnp.float32),
      encoder_params["b_hh"].astype(jnp.float32).reshape(1, -1),
      q_lens.astype(jnp.int32).reshape(B, 1))
    return jnp.moveaxis(finals, 0, 1)  # [B, F, H]
