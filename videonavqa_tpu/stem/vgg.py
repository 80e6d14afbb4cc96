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
