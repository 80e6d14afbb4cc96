"""Frozen VGG-16 partial stem.

The reference extracts per-frame features with an external Faster-RCNN fork's
VGG-16 (Caffe weights), truncated so a 160x208 frame yields 128 channels at
40x52 (eval/q_and_v_eval.py:17,306-310; SURVEY §2.3). That geometry pins the
truncation point to conv2_2 + two 2x2 max-pools:

    conv3-64, relu, conv3-64, relu, pool2 -> conv3-128, relu, conv3-128, relu, pool2

Inputs are the raw decoded BGR pixels scaled by 1/255 (eval/dataset.py:91) with
no mean subtraction — faithfully preserved. Runs frozen (no BN in this stem) in
bfloat16 on the MXU under stop_gradient.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from videonavqa_tpu.ops import initializers as init
from videonavqa_tpu.ops.conv import conv2d, max_pool2d

# (name, cin, cout); 'M' = 2x2/2 max pool.
VGG_PARTIAL_CFG = [
    ("conv1_1", 3, 64), ("conv1_2", 64, 64), "M",
    ("conv2_1", 64, 128), ("conv2_2", 128, 128), "M",
]


def init_vgg_partial(key, dtype=jnp.float32):
    params = {}
    for item in VGG_PARTIAL_CFG:
        if item == "M":
            continue
        name, cin, cout = item
        key, sub = jax.random.split(key)
        params[name] = init.reference_conv2d(sub, 3, 3, cin, cout, dtype=dtype)
    return params


def vgg_partial(params, x, *, dtype=jnp.bfloat16):
    """x: [N, 160, 208, 3] (pixels already /255) -> [N, 40, 52, 128]."""
    h = x
    for item in VGG_PARTIAL_CFG:
        if item == "M":
            h = max_pool2d(h)
        else:
            name = item[0]
            h = jax.nn.relu(conv2d(params[name], h, dtype=dtype))
    return h


def _relay_s2d(w, bias):
    """[3,3,cin,cout] conv kernel -> its exact block-2 space-to-depth form
    [3,3,4cin,4cout] (see relay_s2d_conv1_1 for the tap mapping)."""
    import numpy as np

    w = np.asarray(w, np.float32)
    cin, cout = w.shape[2], w.shape[3]
    wp = np.zeros((3, 3, 4 * cin, 4 * cout), np.float32)
    for a in (0, 1):
        for b in (0, 1):
            for u in range(3):
                ap = (u - 1 + a) % 2
                s = (u - 1 + a - ap) // 2
                for v in range(3):
                    bp = (v - 1 + b) % 2
                    t = (v - 1 + b - bp) // 2
                    wp[s + 1, t + 1,
                       (ap * 2 + bp) * cin:(ap * 2 + bp + 1) * cin,
                       (a * 2 + b) * cout:(a * 2 + b + 1) * cout] = w[u, v]
    return {"weight": jnp.asarray(wp),
            "bias": jnp.asarray(np.tile(np.asarray(bias, np.float32), 4))}


def relay_s2d_conv1_1(params):
    """Re-lay conv1_1 for space-to-depth input — a pure function of weights.

    conv1_1's [3,3,3,64] kernel gives the MXU a 27-element contraction (3 input
    channels), measured in-situ at ~3 TF/s (scripts/stem_prefix_probe.py) — the
    worst layer of the stem. Block-2 space-to-depth re-expresses it EXACTLY as
    a [3,3,12,256] conv on a [H/2, W/2, 12] input (contraction 108 ≈ one MXU
    lane tile, 256 outputs): for output phase (a,b) and tap (u,v), original row
    2i+a+u-1 lands at s2d row i+s, phase a', with a'=(u-1+a)%2 and
    s=(u-1+a-a')//2 in {-1,0,1} — so every original tap maps to one slot of a
    3x3 s2d kernel and the math (27 products per output, plus structural
    zeros the f32 accumulator ignores) is unchanged. SAME padding on the s2d
    grid zero-fills exactly the rows/cols the original SAME padding did.
    Channel packing is (a*2+b)*C + c, matching jnp.reshape/transpose s2d.

    The relaid kernel depends only on the frozen weights — precompute once per
    weights version (the state['int8_wq'] pattern). Kernel being fixed: the
    VGG-16 conv1_1 the reference runs per frame (eval/q_and_v_eval.py:101-110).
    """
    return _relay_s2d(params["conv1_1"]["weight"], params["conv1_1"]["bias"])


def relay_s2d_block1(params):
    """Both block-1 convs in space-to-depth form: conv1_1 -> [3,3,12,256],
    conv1_2 -> [3,3,256,256] (75% structural zeros = 4x the FLOPs, but run at
    MXU-efficient 256-channel shapes), and pool1 disappears — a 2x2/2 max
    pool IS the max over the 4 phases of one s2d pixel, so no depth-to-space
    copy is ever materialized. Exactness: same products + structural zeros
    under f32 accumulation."""
    return {
        "conv1_1": _relay_s2d(params["conv1_1"]["weight"],
                              params["conv1_1"]["bias"]),
        "conv1_2": _relay_s2d(params["conv1_2"]["weight"],
                              params["conv1_2"]["bias"]),
    }


def relay_w2d_block1(params):
    """Both block-1 convs in WIDTH-only block-2 form (width-to-depth):
    conv1_1 -> [3,3,6,128], conv1_2 -> [3,3,128,128] (50% structural zeros =
    2x the FLOPs at the 128-channel shapes conv2_2 runs near peak). The w2d
    relayout is a pure reshape (adjacent column pairs are contiguous in NHWC,
    no transpose), and pool1 decomposes into a free width-phase max + a
    2-row max. Tap mapping: output col 2j+b reads col 2j+b+v-1 = w2d col j+t
    phase b' with b'=(v-1+b)%2, t=(v-1+b-b')//2 in {-1,0,1}."""
    import numpy as np

    out = {}
    for name in ("conv1_1", "conv1_2"):
        w = np.asarray(params[name]["weight"], np.float32)
        cin, cout = w.shape[2], w.shape[3]
        wp = np.zeros((3, 3, 2 * cin, 2 * cout), np.float32)
        for b in (0, 1):
            for v in range(3):
                bp = (v - 1 + b) % 2
                t = (v - 1 + b - bp) // 2
                wp[:, t + 1, bp * cin:(bp + 1) * cin,
                   b * cout:(b + 1) * cout] = w[:, v]
        bias = np.asarray(params[name]["bias"], np.float32)
        out[name] = {"weight": jnp.asarray(wp),
                     "bias": jnp.asarray(np.tile(bias, 2))}
    return out


def vgg_partial_s2d(relaid, params, x, *, dtype=jnp.bfloat16):
    """vgg_partial with conv1_1 computed in space-to-depth layout.

    Mathematically identical dot products (relay_s2d_conv1_1); the s2d
    relayout of the 3-channel input is ~14 MB and the depth-to-space back to
    [H, W, 64] is one transpose XLA fuses into the conv epilogue."""
    N, H, W, C = x.shape
    h = x.astype(dtype)
    h = h.reshape(N, H // 2, 2, W // 2, 2, C)
    h = h.transpose(0, 1, 3, 2, 4, 5).reshape(N, H // 2, W // 2, 4 * C)
    h = jax.nn.relu(conv2d(relaid, h, dtype=dtype))
    # depth-to-space: [N, H/2, W/2, (a,b,64)] -> [N, H, W, 64]
    cout = h.shape[-1] // 4
    h = h.reshape(N, H // 2, W // 2, 2, 2, cout)
    h = h.transpose(0, 1, 3, 2, 4, 5).reshape(N, H, W, cout)
    for item in VGG_PARTIAL_CFG[1:]:
        if item == "M":
            h = max_pool2d(h)
        else:
            h = jax.nn.relu(conv2d(params[item[0]], h, dtype=dtype))
    return h


def _vgg_block2(params, h, *, dtype):
    """conv2_1 -> relu -> conv2_2 -> relu -> pool2 (shared by the variants)."""
    h = jax.nn.relu(conv2d(params["conv2_1"], h, dtype=dtype))
    h = jax.nn.relu(conv2d(params["conv2_2"], h, dtype=dtype))
    return max_pool2d(h)


def vgg_partial_s2d_block1(relaid, params, x, *, dtype=jnp.bfloat16):
    """vgg_partial with ALL of block 1 in space-to-depth layout: no
    depth-to-space copy — pool1 is the max over the 4 phases in place."""
    N, H, W, C = x.shape
    h = x.astype(dtype)
    h = h.reshape(N, H // 2, 2, W // 2, 2, C)
    h = h.transpose(0, 1, 3, 2, 4, 5).reshape(N, H // 2, W // 2, 4 * C)
    h = jax.nn.relu(conv2d(relaid["conv1_1"], h, dtype=dtype))
    h = jax.nn.relu(conv2d(relaid["conv1_2"], h, dtype=dtype))
    h = h.reshape(N, H // 2, W // 2, 4, -1).max(axis=3)  # == pool1
    return _vgg_block2(params, h, dtype=dtype)


def vgg_partial_w2d_block1(relaid, params, x, *, dtype=jnp.bfloat16):
    """vgg_partial with block 1 in width-to-depth layout: the relayout is a
    pure reshape and pool1 = width-phase max + 2-row max."""
    N, H, W, C = x.shape
    h = x.astype(dtype).reshape(N, H, W // 2, 2 * C)
    h = jax.nn.relu(conv2d(relaid["conv1_1"], h, dtype=dtype))
    h = jax.nn.relu(conv2d(relaid["conv1_2"], h, dtype=dtype))
    h = h.reshape(N, H, W // 2, 2, -1).max(axis=3)  # pool1's width pairs
    h = jnp.maximum(h[:, 0::2], h[:, 1::2])         # pool1's row pairs
    return _vgg_block2(params, h, dtype=dtype)
