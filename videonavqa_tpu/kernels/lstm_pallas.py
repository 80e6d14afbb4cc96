"""Fused masked-LSTM sequence kernel (Pallas TPU).

The whole recurrence runs inside ONE kernel with the hidden/cell state and
recurrent weights VMEM-resident, instead of a ``lax.scan`` that round-trips
(h, c) through HBM and dispatches one fused op per step. The input projection
``x @ W_ih^T + b_ih`` stays outside as a single large MXU matmul.

Used on the inference/serving path (the training path keeps the XLA scan for
autodiff); semantics are identical to ops.lstm — packed-sequence masking with
zero-padded outputs and frozen final carry.

VMEM budget at harness shapes (T=56, B=32, H=128): xw 3.7 MB + outs 0.9 MB +
weights 0.3 MB — comfortably within ~16 MB.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from videonavqa_tpu.ops.linear import linear as _linear


def _lstm_kernel(xw_ref, w_hh_ref, b_hh_ref, lens_ref, h0_ref, c0_ref,
                 outs_ref, hf_ref, cf_ref):
    T = xw_ref.shape[0]
    H = w_hh_ref.shape[1]
    w_hh_t = jnp.transpose(w_hh_ref[:, :])  # [H, 4H]
    b_hh = b_hh_ref[:, :]  # [1, 4H]
    lens = lens_ref[:, :]  # [B, 1]

    def step(t, carry):
        h, c = carry
        gates = xw_ref[t] + jnp.dot(h, w_hh_t, preferred_element_type=jnp.float32) + b_hh
        i = jax.nn.sigmoid(gates[:, 0 * H:1 * H])
        f = jax.nn.sigmoid(gates[:, 1 * H:2 * H])
        g = jnp.tanh(gates[:, 2 * H:3 * H])
        o = jax.nn.sigmoid(gates[:, 3 * H:4 * H])
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        valid = t < lens  # [B, 1]
        h = jnp.where(valid, h_new, h)
        c = jnp.where(valid, c_new, c)
        outs_ref[t] = jnp.where(valid, h_new, jnp.zeros_like(h_new))
        return h, c

    h, c = jax.lax.fori_loop(0, T, step, (h0_ref[:, :], c0_ref[:, :]))
    hf_ref[:, :] = h
    cf_ref[:, :] = c


def lstm_pallas(params, x, lens, h0=None, c0=None, *, precomputed_xw=None,
                interpret=False):
    """Drop-in for ops.lstm: x [B, T, E] -> (outs [B, T, H], (h_f, c_f)).

    ``precomputed_xw`` ([B, T, 4H]) hoists the input projection for callers
    that re-scan the same sequence (ops.lstm has the same escape hatch)."""
    B, T, _ = x.shape
    H = params["w_hh"].shape[1]
    if h0 is None:
        h0 = jnp.zeros((B, H), jnp.float32)
    if c0 is None:
        c0 = jnp.zeros((B, H), jnp.float32)

    xw = precomputed_xw if precomputed_xw is not None else _linear(
        {"weight": params["w_ih"], "bias": params["b_ih"]}, x)
    xw_t = jnp.moveaxis(xw, 1, 0).astype(jnp.float32)  # [T, B, 4H]

    outs, hf, cf = pl.pallas_call(
        _lstm_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((T, B, H), jnp.float32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 3,
        interpret=interpret,
    )(xw_t, params["w_hh"].astype(jnp.float32),
      params["b_hh"].astype(jnp.float32).reshape(1, -1),
      lens.astype(jnp.int32).reshape(B, 1), h0, c0)
    return jnp.moveaxis(outs, 0, 1), (hf, cf)
