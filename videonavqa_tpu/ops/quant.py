"""Generic int8 conv quantization for serving paths.

v5e's MXU runs int8 x int8 -> int32 at ~2x the bf16 rate; measured on-chip at
FiLM-trunk shapes ([1120, 10, 13, 1024], 3x3x1024x1024 kernel): bf16 14.6 ms
vs int8 incl. in-graph quantize/dequantize 8.2 ms (1.78x). Unlike the VGG
stem (stem/quant.py), trunk activations are tiny (10x13 grids), so DYNAMIC
per-tensor activation scaling costs almost nothing — no calibration pass or
quantized-parameter side state is needed; ``conv2d_int8_dynamic`` is a pure
drop-in for ops.conv.conv2d that quantizes both operands in-graph.

Weights quantize per-output-channel symmetric (exact scales from the live
weights each call — cheap next to the conv, and keeps trained params the
single source of truth). Inference-only: no custom VJP, callers gate on
``not train``.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from videonavqa_tpu.ops.conv import _DN2D


def _conv_i8(xq, wq, stride, padding):
    """int8 conv -> int32; 1x1 stride-1 kernels lower as dot_general (the
    conv tiler pads odd spatial grids — 2.59 vs 2.18 ms at the [1120,10,13,
    1024] trunk shape, scripts/trunk_gap_probe.py)."""
    if wq.shape[0] == 1 and wq.shape[1] == 1 and tuple(stride) == (1, 1):
        return lax.dot_general(xq, wq[0, 0],
                               (((xq.ndim - 1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)
    return lax.conv_general_dilated(
        xq, wq, window_strides=stride, padding=padding,
        dimension_numbers=_DN2D, preferred_element_type=jnp.int32)


def quantize_weight_channelwise(w):
    """HWIO kernel -> (int8 kernel, [Cout] scales), symmetric absmax."""
    absmax = jnp.max(jnp.abs(w), axis=(0, 1, 2), keepdims=True)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return q, scale.reshape(-1)


def quantize_act_dynamic(x):
    """f32/bf16 activations -> (int8, scalar scale), per-tensor absmax."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)))
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale),
                 -127, 127).astype(jnp.int8)
    return q, scale


def conv2d_int8_prequant(wq, w_scale, bias, x, act_absmax, *, stride=(1, 1),
                         padding="SAME", out_dtype=jnp.float32):
    """int8 conv2d in its serving steady state: weights are PRE-QUANTIZED
    (int8 kernel + per-out-channel scales recorded by the calibration pass,
    models/film.py) and the activation absmax is pre-calibrated. Per step,
    only the activation quantize + the int8 conv remain — no weight-tensor
    round/clip passes, and the trunk's weight HBM reads halve (int8 vs
    bf16/f32 re-read + re-quantize every call).

    ``out_dtype``: dequant/bias run in f32, then the output is stored at this
    dtype. bf16 halves the inter-op HBM traffic of the trunk's elementwise
    chain; its ~2^-8 rounding is the same order as the int8 quantization
    error the next conv applies anyway."""
    sx = jnp.maximum(act_absmax.astype(jnp.float32), 1e-8) / 127.0
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx),
                  -127, 127).astype(jnp.int8)
    acc = _conv_i8(xq, wq, stride, padding)
    y = acc.astype(jnp.float32) * (sx * w_scale)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)


def conv2d_int8_preq_act(wq, w_scale, bias, xq, act_absmax, *, stride=(1, 1),
                         padding="SAME", out_dtype=jnp.float32):
    """conv2d_int8_prequant with the activation ALREADY int8 (produced by a
    fused upstream kernel that requantized with this conv's calibrated
    absmax, kernels/int8_matmul_pallas.py next_absmax) — only the int8 conv
    and the dequant epilogue remain."""
    sx = jnp.maximum(act_absmax.astype(jnp.float32), 1e-8) / 127.0
    acc = _conv_i8(xq, wq, stride, padding)
    y = acc.astype(jnp.float32) * (sx * w_scale)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)


def conv2d_int8_static(params, x, act_absmax, *, stride=(1, 1), padding="SAME",
                       out_dtype=jnp.float32):
    """int8 conv2d with a PRE-CALIBRATED per-tensor activation absmax (a
    scalar recorded by a calibration forward): no per-batch reduction, which
    is what makes dynamic int8 latency-bound at batch 1. Out-of-range
    activations clip at +-127 (the calibration headroom factor absorbs
    typical batch-to-batch drift)."""
    wq, sw = quantize_weight_channelwise(params["weight"])
    sx = jnp.maximum(act_absmax.astype(jnp.float32), 1e-8) / 127.0
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx),
                  -127, 127).astype(jnp.int8)
    acc = _conv_i8(xq, wq, stride, padding)
    y = acc.astype(jnp.float32) * (sx * sw)
    b = params.get("bias")
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(out_dtype)


def conv2d_int8_dynamic(params, x, *, stride=(1, 1), padding="SAME",
                        out_dtype=jnp.float32):
    """Drop-in int8 conv2d: quantize weights (per-out-channel) and
    activations (per-tensor, dynamic) in-graph, accumulate int32, dequantize,
    add bias in f32. Returns f32."""
    wq, sw = quantize_weight_channelwise(params["weight"])
    xq, sx = quantize_act_dynamic(x)
    acc = _conv_i8(xq, wq, stride, padding)
    y = acc.astype(jnp.float32) * (sx * sw)
    b = params.get("bias")
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(out_dtype)
