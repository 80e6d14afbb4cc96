"""Fused VGG block-1 kernel (Pallas TPU): conv1_1 + conv1_2 + pool1 in VMEM.

The stem's two worst layers live in block 1 (in-situ on the v5e,
scripts/stem_prefix_probe.py: conv1_1 1.34 ms at 3 TF/s — a 27-element MXU
contraction — and conv1_2 1.38 ms at 62 TF/s from its 64-channel shapes;
pool1 another 0.61 ms). XLA-level relayings all lose to HBM relayout costs
(PERF.md "batch-1 online stem", 0.86-0.93x). This kernel does the width-to-
depth packing where it is free — in VMEM:

  - conv1_1 becomes one im2col matmul, contraction 54 = 3x3 taps x (2 cols x
    3 ch), built XLA-side from 9 shifted slices (pure data movement, ~63 MB
    for 35 frames vs the 300 MB conv1 activation round-trip it replaces);
  - conv1_2 becomes 9 shifted [*,128]x[128,128] MXU matmuls on the w2d grid
    (2x the FLOPs as structural zeros, at full-lane shapes) accumulated in
    f32, its 149 MB (bf16, 35 frames) input activation never touching HBM;
  - pool1 collapses into a lane max (width phases) + a row-pair max, so the
    kernel writes only the pooled [80,104,64] result.

Grid is (frames, 2 row-halves); each program DMAs its haloed patch window
from HBM (rows clamped at the frame edge, h1's out-of-frame rows zeroed to
preserve conv1_2's SAME padding semantics). Exactness: identical products +
structural zeros under f32 accumulation (tests/test_stem_s2d.py covers the
relay; tests/test_kernels.py covers this kernel vs vgg_partial).

Reference layers being fused: the per-frame VGG-16 conv1_1/conv1_2/pool1 of
the frozen stem, eval/q_and_v_eval.py:17,306-310.
"""

from __future__ import annotations



import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W = 160, 208
WD = W // 2          # w2d grid width (104)
HH = H // 2          # rows per half-frame (80)
_ROWS = HH + 2       # h1 rows needed per half (halo)   = 82
_VALID = (HH + 1) * WD   # DMA'd patch rows per half    = 81*104
_TILE = 40           # conv1_2 output rows per inner tile


def _kernel(patches_hbm, w1_ref, b1_ref, w2_ref, b2_ref, out_ref,
            patches_s, h1p, sem):
    m = pl.program_id(0)
    h = pl.program_id(1)

    # --- haloed patch window: h1 rows [h*80-1, h*80+81), edges zeroed ---
    src_start = pl.multiple_of(jnp.maximum(h * HH - 1, 0) * WD, 8)
    dst_off = pl.multiple_of(jnp.where(h == 0, WD, 0), 8)
    dma = pltpu.make_async_copy(
        patches_hbm.at[m, pl.ds(src_start, _VALID), :],
        patches_s.at[pl.ds(dst_off, _VALID), :], sem)
    dma.start()

    @pl.when(h == 0)
    def _():
        patches_s[0:WD, :] = jnp.zeros((WD, patches_s.shape[1]),
                                       patches_s.dtype)

    @pl.when(h != 0)
    def _():
        patches_s[_VALID:, :] = jnp.zeros((WD, patches_s.shape[1]),
                                          patches_s.dtype)

    dma.wait()

    # --- conv1_1 as one matmul (contraction 54), relu, into padded h1 ---
    h1 = jnp.dot(patches_s[:, :], w1_ref[:, :],
                 preferred_element_type=jnp.float32)
    h1 = jax.nn.relu(h1 + b1_ref[:, :]).astype(h1p.dtype)
    h1p[:, 1:WD + 1, :] = h1.reshape(_ROWS, WD, h1.shape[-1])
    zcol = jnp.zeros((_ROWS, 1, h1p.shape[-1]), h1p.dtype)
    h1p[:, 0:1, :] = zcol          # conv1_2 SAME col padding
    h1p[:, WD + 1:WD + 2, :] = zcol

    # h1 rows OUTSIDE the frame are zero in the original (SAME padding), but
    # relu(0 @ w1 + b1) != 0 — zero them explicitly.
    zrow = jnp.zeros((1, WD + 2, h1p.shape[-1]), h1p.dtype)

    @pl.when(h == 0)
    def _():
        h1p[0:1] = zrow

    @pl.when(h != 0)
    def _():
        h1p[_ROWS - 1:_ROWS] = zrow

    # --- conv1_2 as 9 shifted full-lane matmuls, relu, pool1, store ---
    C2 = w2_ref.shape[-1]
    for i in range(HH // _TILE):
        acc = jnp.zeros((_TILE * WD, C2), jnp.float32)
        for u in range(3):
            for v in range(3):
                sl = h1p[i * _TILE + u:i * _TILE + u + _TILE,
                         v:v + WD, :].reshape(_TILE * WD, -1)
                acc += jnp.dot(sl, w2_ref[u * 3 + v],
                               preferred_element_type=jnp.float32)
        y = jax.nn.relu(acc + b2_ref[:, :]).reshape(_TILE, WD, C2)
        y = jnp.maximum(y[:, :, :C2 // 2], y[:, :, C2 // 2:])  # width pairs
        y = y.reshape(_TILE // 2, 2, WD, C2 // 2).max(axis=1)  # row pairs
        out_ref[i * (_TILE // 2):(i + 1) * (_TILE // 2)] = \
            y.astype(out_ref.dtype)


def vgg_block1_pallas(relaid, x, *, dtype=jnp.bfloat16, interpret=False):
    """relu(conv1_2(relu(conv1_1(x)))) + pool1, fused.

    relaid: relay_w2d_block1(vgg_params) — conv1_1 [3,3,6,128] and conv1_2
    [3,3,128,128] in width-to-depth form (precomputed per weights version).
    x: [M, 160, 208, 3] -> [M, 80, 104, 64] (bf16).
    """
    M = x.shape[0]
    assert x.shape[1:] == (H, W, 3), x.shape
    xw = x.astype(dtype).reshape(M, H, WD, 6)
    xp = jnp.pad(xw, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # im2col on the w2d grid: (u, v, channel)-ordered taps, contraction 54,
    # zero-padded to one full 128 lane tile (Mosaic DMA slices must be
    # lane-tile aligned; the pad rows of w1 are zero, so products are
    # unchanged)
    patches = jnp.concatenate(
        [xp[:, u:u + H, v:v + WD, :] for u in range(3) for v in range(3)],
        axis=-1).reshape(M, H * WD, 54)
    patches = jnp.pad(patches, ((0, 0), (0, 0), (0, 128 - 54)))

    w1 = jnp.pad(relaid["conv1_1"]["weight"].reshape(54, -1),
                 ((0, 128 - 54), (0, 0))).astype(dtype)
    b1 = relaid["conv1_1"]["bias"].reshape(1, -1).astype(jnp.float32)
    w2 = relaid["conv1_2"]["weight"].reshape(9, w1.shape[1], -1).astype(dtype)
    b2 = relaid["conv1_2"]["bias"].reshape(1, -1).astype(jnp.float32)
    c1, c2 = w1.shape[1], w2.shape[-1]

    out = pl.pallas_call(
        _kernel,
        grid=(M, 2),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((128, c1), lambda m, h: (0, 0)),
            pl.BlockSpec((1, c1), lambda m, h: (0, 0)),
            pl.BlockSpec((9, c1, c2), lambda m, h: (0, 0, 0)),
            pl.BlockSpec((1, c2), lambda m, h: (0, 0)),
        ],
        out_specs=pl.BlockSpec((None, HH // 2, WD, c2 // 2),
                               lambda m, h: (m, h, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((M, HH, WD, c2 // 2), dtype),
        scratch_shapes=[
            pltpu.VMEM((_ROWS * WD, 128), dtype),
            pltpu.VMEM((_ROWS, WD + 2, c1), dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(patches, w1, b1, w2, b2)
    return out


def vgg_partial_w2d_pallas(relaid, params, x, *, dtype=jnp.bfloat16,
                           interpret=False):
    """vgg_partial with block 1 fused in VMEM (then block 2 in XLA)."""
    from videonavqa_tpu.ops.conv import conv2d, max_pool2d

    h = vgg_block1_pallas(relaid, x, dtype=dtype, interpret=interpret)
    h = jax.nn.relu(conv2d(params["conv2_1"], h, dtype=dtype))
    h = jax.nn.relu(conv2d(params["conv2_2"], h, dtype=dtype))
    return max_pool2d(h)
