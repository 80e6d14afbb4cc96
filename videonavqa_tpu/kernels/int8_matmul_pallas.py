"""Fused int8 1x1-conv (channel matmul) kernel for the FiLM trunk (Pallas TPU).

The serving trunk's 1x1 convs (models/film.py block(): ``res =
relu(conv1x1(x))``; reference models/film_global_pooling_pt_stem.py:85-108)
are HBM-bound, not MXU-bound, in the XLA int8 path: quantize writes an int8
copy of the activation, the conv writes a full-width int32 accumulator, and
the dequant+bias+relu epilogue reads it back — ~2.1 GB of traffic for a
0.31 TFLOP matmul at the flagship [32*35, 10, 13, 1024] shape (measured
2.9-3.0 ms vs a ~0.8 ms int8 roofline, scripts/trunk_gap_probe.py).

This kernel keeps the whole chain in VMEM/registers: per row-block it
quantizes the bf16 activation in-register, runs the int8 x int8 -> int32
matmul on the MXU with the weight block resident across the grid, applies
the f32 dequant + bias (+ optional fused ReLU), and writes bf16 — HBM
traffic drops to read-x + write-y (~0.6 GB, ~4x less).

Serving path only (weights pre-quantized by the int8 calibration pass,
models/film.py); training keeps the XLA conv for autodiff.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, wq_ref, comb_ref, bias_ref, sx_ref, o_ref, *, relu):
    sx = sx_ref[0, 0]
    xq = jnp.clip(jnp.round(x_ref[:, :].astype(jnp.float32) / sx),
                  -127.0, 127.0).astype(jnp.int8)
    acc = jax.lax.dot_general(xq, wq_ref[:, :], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * comb_ref[:, :] + bias_ref[:, :]
    if relu:
        y = jnp.maximum(y, 0.0)
    o_ref[:, :] = y.astype(o_ref.dtype)


def _kernel_requant(x_ref, wq_ref, comb_ref, bias_ref, sx_ref, nx_ref,
                    o_ref, oq_ref, *, relu):
    sx = sx_ref[0, 0]
    xq = jnp.clip(jnp.round(x_ref[:, :].astype(jnp.float32) / sx),
                  -127.0, 127.0).astype(jnp.int8)
    acc = jax.lax.dot_general(xq, wq_ref[:, :], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * comb_ref[:, :] + bias_ref[:, :]
    if relu:
        y = jnp.maximum(y, 0.0)
    o_ref[:, :] = y.astype(o_ref.dtype)
    oq_ref[:, :] = jnp.clip(jnp.round(y / nx_ref[0, 0]),
                            -127.0, 127.0).astype(jnp.int8)


def matmul_int8_fused_pallas(x, wq, w_scale, bias, act_absmax, *, relu=False,
                             next_absmax=None, out_dtype=jnp.bfloat16,
                             block_rows=512, interpret=False):
    """Fused quantize -> int8 matmul -> dequant(+bias)(+relu) over channels.

    x [..., Cin] (bf16/f32), wq [Cin, Cout] int8, w_scale [Cout] f32
    per-out-channel weight scales, bias [Cout] or None, act_absmax scalar
    (pre-calibrated per-tensor activation absmax). The integer
    quantize/matmul matches ops.quant.conv2d_int8_prequant exactly; the f32
    dequant epilogue agrees to round-off (FMA fusion may differ across XLA
    programs). ``relu=True`` additionally folds the trunk's ReLU.
    Returns x.shape[:-1] + [Cout] at ``out_dtype``.

    ``next_absmax`` (scalar, optional): also requantize the result with the
    NEXT conv's calibrated activation absmax in-register and return
    ``(y, yq_int8)`` — the consumer (the block's 3x3 conv) then skips its
    own quantize pass (an extra read+write of the activation). yq is
    quantized from the f32 epilogue value, not the stored bf16 y, so it can
    differ from quantizing y by one int8 step in rare round-boundary cases.
    """
    cin, cout = wq.shape
    lead = x.shape[:-1]
    rows = 1
    for d in lead:
        rows *= d
    x2 = x.reshape(rows, cin)

    sx = (jnp.maximum(act_absmax.astype(jnp.float32), 1e-8) / 127.0).reshape(1, 1)
    comb = (sx[0, 0] * w_scale.astype(jnp.float32)).reshape(1, cout)
    b = (jnp.zeros((1, cout), jnp.float32) if bias is None
         else bias.astype(jnp.float32).reshape(1, cout))

    bm = min(block_rows, rows)
    grid = (rows + bm - 1) // bm
    in_specs = [
        pl.BlockSpec((bm, cin), lambda i: (i, 0)),
        pl.BlockSpec((cin, cout), lambda i: (0, 0)),
        pl.BlockSpec((1, cout), lambda i: (0, 0)),
        pl.BlockSpec((1, cout), lambda i: (0, 0)),
        pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
    ]
    if next_absmax is None:
        out = pl.pallas_call(
            functools.partial(_kernel, relu=relu),
            out_shape=jax.ShapeDtypeStruct((rows, cout), out_dtype),
            grid=(grid,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((bm, cout), lambda i: (i, 0)),
            interpret=interpret,
        )(x2, wq, comb, b, sx)
        return out.reshape(*lead, cout)

    nx = (jnp.maximum(next_absmax.astype(jnp.float32), 1e-8) / 127.0
          ).reshape(1, 1)
    out, outq = pl.pallas_call(
        functools.partial(_kernel_requant, relu=relu),
        out_shape=[jax.ShapeDtypeStruct((rows, cout), out_dtype),
                   jax.ShapeDtypeStruct((rows, cout), jnp.int8)],
        grid=(grid,),
        in_specs=in_specs + [
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)],
        out_specs=[pl.BlockSpec((bm, cout), lambda i: (i, 0)),
                   pl.BlockSpec((bm, cout), lambda i: (i, 0))],
        interpret=interpret,
    )(x2, wq, comb, b, sx, nx)
    return out.reshape(*lead, cout), outq.reshape(*lead, cout)
