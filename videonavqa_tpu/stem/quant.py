"""Int8-quantized frozen stem.

The frozen VGG-16+ObjDetectCNN stem is ~57% of the training step and runs at
bf16 MXU roofline; v5e's int8 path doubles the MXU rate. Since the stem is
frozen (inference-only), it quantizes cleanly:

- weights: per-output-channel symmetric int8 (offline, exact scales);
- activations: per-tensor dynamic symmetric int8 (absmax each call);
- convs accumulate int8 x int8 -> int32, dequantized by (s_x * s_w[c]);
- eval-mode BatchNorms fold into the dequantization affine.

Flag-gated (``use_int8_stem``); feature error vs the f32 stem is checked in
tests and the accuracy impact must be validated per-dataset before enabling
for paper-comparable numbers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from videonavqa_tpu.ops.conv import _DN2D, max_pool2d
from videonavqa_tpu.ops.norm import EPS
from videonavqa_tpu.stem.vgg import VGG_PARTIAL_CFG


def _quantize_weight(w):
    """HWIO kernel -> (int8 kernel, per-out-channel scale)."""
    absmax = jnp.max(jnp.abs(w), axis=(0, 1, 2), keepdims=True)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return q, scale.reshape(-1)


def _quantize_act(x):
    """f32 activations -> (int8, scalar scale), per-tensor dynamic symmetric."""
    absmax = jnp.max(jnp.abs(x))
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _conv_int8(xq, wq, sx, sw):
    acc = lax.conv_general_dilated(
        xq, wq, (1, 1), "SAME", dimension_numbers=_DN2D,
        preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * (sx * sw)


def _bn_affine(state, params):
    """Eval-mode BN as (scale, shift) per channel."""
    inv = jax.lax.rsqrt(state["var"] + EPS)
    scale = params["weight"] * inv
    shift = params["bias"] - state["mean"] * scale
    return scale, shift


#: conv layer names in forward order (10 conv inputs to calibrate)
_CONV_ORDER = tuple(item[0] for item in VGG_PARTIAL_CFG if item != "M") + tuple(
    f"conv{b}{i}" for b in range(1, 4) for i in (1, 2))


def quantize_stem(vgg_params, det_params, act_scales=None):
    """Precompute int8 weights + per-channel scales for both stem stages.

    ``act_scales``: optional {conv_name: float} static activation scales from
    ``calibrate_act_scales`` — with them, quantization is a fused elementwise
    op; without, each conv pays a dynamic absmax reduction (measured on v5e:
    static 80 ms vs dynamic 115 ms vs bf16 108 ms for a 640-frame stem pass).
    """
    q = {"vgg": {}, "det": {}, "act_scales": act_scales}
    for item in VGG_PARTIAL_CFG:
        if item == "M":
            continue
        name = item[0]
        wq, sw = _quantize_weight(vgg_params[name]["weight"])
        q["vgg"][name] = {"wq": wq, "sw": sw, "bias": vgg_params[name]["bias"]}
    for b in range(1, 4):
        for c in (f"conv{b}1", f"conv{b}2"):
            wq, sw = _quantize_weight(det_params[c]["weight"])
            q["det"][c] = {"wq": wq, "sw": sw, "bias": det_params[c]["bias"]}
    return q


def calibrate_act_scales(vgg_params, det_params, det_state, videos, margin=1.1):
    """Run the f32 stem over calibration videos, recording each conv input's
    absmax -> {conv_name: scale}. ``videos``: [B, T, 160, 208, 3] f32."""
    scales = {}

    def record(name, h):
        absmax = float(jnp.max(jnp.abs(h)))
        scales[name] = max(absmax * margin, 1e-6) / 127.0
        return h

    def run(video):
        B, T = video.shape[:2]
        h = video.reshape(B * T, *video.shape[2:])
        from videonavqa_tpu.ops.conv import conv2d

        for item in VGG_PARTIAL_CFG:
            if item == "M":
                h = max_pool2d(h)
                continue
            name = item[0]
            record(name, h)
            h = jax.nn.relu(conv2d(vgg_params[name], h, dtype=jnp.float32))
        scale, shift = _bn_affine(det_state["bn_input"], det_params["bn_input"])
        h = h * scale + shift
        for b in range(1, 4):
            for c in (f"conv{b}1", f"conv{b}2"):
                record(c, h)
                h = conv2d(det_params[c], h, dtype=jnp.float32)
            scale, shift = _bn_affine(det_state[f"bn{b}"], det_params[f"bn{b}"])
            h = jax.nn.relu(h * scale + shift)
            if b < 3:
                h = max_pool2d(h)

    run(videos)
    return scales


def _qact(h, qstem, name):
    static = qstem.get("act_scales")
    if static is not None:
        s = static[name]
        return jnp.clip(jnp.round(h * (1.0 / s)), -127, 127).astype(jnp.int8), s
    return _quantize_act(h)


def stem_features_int8(qstem, det_params, det_state, video):
    """Int8 counterpart of stem.stem_features: [B,T,160,208,3] -> [B,T,10,13,512].

    Layer structure matches stem.vgg.vgg_partial + stem.obj_detector.
    obj_detector_features exactly (pool placement, back-to-back convs, BN/ReLU
    order); only the conv arithmetic is quantized.
    """
    B, T = video.shape[:2]
    h = video.reshape(B * T, *video.shape[2:])

    for item in VGG_PARTIAL_CFG:
        if item == "M":
            h = max_pool2d(h)
            continue
        name = item[0]
        layer = qstem["vgg"][name]
        xq, sx = _qact(h, qstem, name)
        h = _conv_int8(xq, layer["wq"], sx, layer["sw"]) + layer["bias"]
        h = jax.nn.relu(h)

    # detector input BN (eval)
    scale, shift = _bn_affine(det_state["bn_input"], det_params["bn_input"])
    h = h * scale + shift
    for b in range(1, 4):
        for c in (f"conv{b}1", f"conv{b}2"):
            layer = qstem["det"][c]
            xq, sx = _qact(h, qstem, c)
            h = _conv_int8(xq, layer["wq"], sx, layer["sw"]) + layer["bias"]
        scale, shift = _bn_affine(det_state[f"bn{b}"], det_params[f"bn{b}"])
        h = jax.nn.relu(h * scale + shift)
        if b < 3:
            h = max_pool2d(h)

    h = h.reshape(B, T, *h.shape[1:])
    return jax.lax.stop_gradient(h)
