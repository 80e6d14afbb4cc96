"""Masked LSTM scans — the TPU replacement for cuDNN packed sequences.

The reference handles ragged sequences with sort-by-length + pack_padded_sequence
+ inverse-permute (e.g. models/q_only_lstm.py:61-69). That idiom is inherently
data-dependent; here sequences keep fixed [B, T] shapes and a masked
``lax.scan`` reproduces packed semantics exactly:

- the carried (h, c) freezes once t >= len (so the final carry equals each
  sequence's own last state, as pack_padded returns),
- per-step outputs are zero beyond each sequence's length (as pad_packed pads),
- the input projection ``x @ W_ih^T`` for all steps is hoisted out of the scan
  into one large MXU matmul.

Gate order is torch's (i, f, g, o); weights are torch-layout [4H, in] / [4H, H].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from videonavqa_tpu.ops.linear import linear as _linear


def lstm_cell(params, x, h, c):
    """One torch nn.LSTMCell step. x: [B, E]; h, c: [B, H]."""
    gates = (
        _linear({"weight": params["w_ih"], "bias": params["b_ih"]}, x)
        + _linear({"weight": params["w_hh"], "bias": params["b_hh"]}, h)
    )
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
    g = jnp.tanh(g)
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


def lstm(params, x, lens, h0=None, c0=None, *, precomputed_xw=None,
         use_pallas=False):
    """Masked LSTM over x: [B, T, E] with per-example lengths [B].

    Returns (outputs [B, T, H] zero-padded beyond lens, (h_final, c_final)) with
    packed-sequence semantics. (h0, c0) defaults to zeros (the harness-level
    init_hidden, eval/q_and_v_eval.py:119-120).

    ``precomputed_xw`` ([B, T, 4H] = x @ W_ih^T + b_ih) lets callers that scan
    the same sequence repeatedly (the FiLM frame loop) hoist the projection.

    ``use_pallas`` routes to the fused VMEM-resident kernel
    (kernels/lstm_pallas.py) — serving only; it has no custom VJP, so models
    gate it on ``cfg.use_pallas_kernels and not train``.
    """
    if use_pallas:
        from videonavqa_tpu.kernels.lstm_pallas import lstm_pallas

        return lstm_pallas(params, x, lens, h0, c0,
                           precomputed_xw=precomputed_xw)
    B, T, _ = x.shape
    H = params["w_hh"].shape[1]
    if h0 is None:
        h0 = jnp.zeros((B, H), x.dtype)
    if c0 is None:
        c0 = jnp.zeros((B, H), x.dtype)

    # One big MXU matmul for all timesteps' input projections.
    xw = precomputed_xw if precomputed_xw is not None else _linear(
        {"weight": params["w_ih"], "bias": params["b_ih"]}, x)  # [B,T,4H]
    xw_t = jnp.moveaxis(xw, 1, 0)  # [T,B,4H]
    t_steps = jnp.arange(T)

    w_hh, b_hh = params["w_hh"], params["b_hh"]

    def step(carry, inp):
        h, c = carry
        xw_step, t = inp
        gates = xw_step + _linear({"weight": w_hh, "bias": b_hh}, h)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        valid = (t < lens)[:, None]
        h = jnp.where(valid, h_new, h)
        c = jnp.where(valid, c_new, c)
        out = jnp.where(valid, h_new, jnp.zeros_like(h_new))
        return (h, c), out

    (h_f, c_f), outs = jax.lax.scan(step, (h0, c0), (xw_t, t_steps))
    return jnp.moveaxis(outs, 0, 1), (h_f, c_f)


def reverse_padded(x, lens):
    """Reverse each row of x: [B, T, ...] within its valid prefix.

    Positions t >= len keep their original values (callers mask them anyway).
    This is how a packed bidirectional LSTM's reverse direction walks each
    sequence from len-1 down to 0 (models/mac.py:210-214).
    """
    B, T = x.shape[:2]
    t = jnp.arange(T)[None, :]
    idx = jnp.where(t < lens[:, None], lens[:, None] - 1 - t, t)
    return jnp.take_along_axis(x, idx.reshape(B, T, *([1] * (x.ndim - 2))), axis=1)


def bilstm(fwd_params, bwd_params, x, lens, *, use_pallas=False):
    """Bidirectional masked LSTM (torch nn.LSTM(bidirectional=True) over packed input).

    Returns (outputs [B, T, 2H] zero-padded beyond lens, h_n [B, 2H]).
    """
    out_f, (h_f, _) = lstm(fwd_params, x, lens, use_pallas=use_pallas)
    out_b_rev, (h_b, _) = lstm(bwd_params, reverse_padded(x, lens), lens,
                               use_pallas=use_pallas)
    out_b = reverse_padded(out_b_rev, lens)
    mask = (jnp.arange(x.shape[1])[None, :] < lens[:, None])[..., None]
    out_b = jnp.where(mask, out_b, 0.0)
    return jnp.concatenate([out_f, out_b], axis=-1), jnp.concatenate([h_f, h_b], axis=-1)


def last_valid(y, lens):
    """Gather y[b, lens[b] - 1] — the reference's last-timestep gather
    (models/q_only_lstm.py:67-68)."""
    B = y.shape[0]
    idx = jnp.clip(lens - 1, 0, y.shape[1] - 1)
    return y[jnp.arange(B), idx]
