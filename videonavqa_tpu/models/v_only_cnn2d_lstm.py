"""Video-only per-frame 2D CNN + LSTM.

Reference: VideoOnlyCNN2DLSTM (models/v_only_cnn2d_lstm.py:10-101):
BN3d on the clip -> per-frame VGG-11-style trunk
(cfg [16,'M',32,'M',64,'M',128,'M',128,'M'] with BN, torchvision make_layers)
-> flatten 128*5*6 -> LSTM(128) over frames -> last-valid gather -> Linear.

The reference's per-frame effective-batch shrink loop (:78-89) becomes a fused
[B*T] conv trunk with per-frame masked BatchNorm; the frame LSTM is a masked
scan over zero-padded per-frame features (exactly what the v_features buffer +
pack_padded_sequence produce, :74-91).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from videonavqa_tpu.models.base import register_model
from videonavqa_tpu.ops.video import normalize_video
from videonavqa_tpu.ops import initializers as init
from videonavqa_tpu.ops.conv import conv2d, max_pool2d
from videonavqa_tpu.ops.linear import linear
from videonavqa_tpu.ops.lstm import last_valid, lstm
from videonavqa_tpu.ops.masking import length_mask, mask_invalid
from videonavqa_tpu.ops.norm import batch_norm, frame_batch_norm, init_bn

VGG11_CFG = (16, 32, 64, 128, 128)  # each followed by BN, ReLU, maxpool2
FRAME_FEAT_DIM = 128 * 5 * 6


def init_frame_trunk(key, in_channels=3):
    """The [conv3x3 -> BN -> ReLU -> pool] x5 per-frame trunk (shared with
    concat2d, models/q_concat_cnn2d_lstm.py:22-24)."""
    params, state = {}, {}
    cin = in_channels
    for i, cout in enumerate(VGG11_CFG):
        key, sub = jax.random.split(key)
        params[f"conv{i}"] = init.reference_conv2d(sub, 3, 3, cin, cout)
        params[f"bn{i}"], state[f"bn{i}"] = init_bn(cout)
        cin = cout
    return params, state


def frame_trunk(params, state, video, frame_mask, cfg, *, train):
    """video [B, T, 160, 208, 3] -> per-frame features [B, T, 128*5*6]
    (torch CHW flatten order), zeroed at invalid frames. Returns (y, new_state)."""
    B, T = video.shape[:2]
    dtype = jnp.dtype(cfg.compute_dtype)
    h = video
    new_state = dict(state)
    for i in range(len(VGG11_CFG)):
        flat = h.reshape(B * T, *h.shape[2:])
        flat = conv2d(params[f"conv{i}"], flat, dtype=dtype)
        h = flat.reshape(B, T, *flat.shape[1:])
        h, new_state[f"bn{i}"] = frame_batch_norm(
            params[f"bn{i}"], state[f"bn{i}"], h, frame_mask, train=train)
        h = jax.nn.relu(h)
        h = max_pool2d(h)
    # [B,T,5,6,128] -> torch [.., 128, 5, 6] flatten order
    feats = jnp.transpose(h, (0, 1, 4, 2, 3)).reshape(B, T, -1)
    return mask_invalid(feats, jnp.sum(frame_mask, axis=1)), new_state


def init_fn(key, cfg):
    ks = jax.random.split(key, 4)
    params, state = {}, {}
    params["input_bn"], state["input_bn"] = init_bn(3)
    trunk_params, trunk_state = init_frame_trunk(ks[0])
    params["trunk"], state["trunk"] = trunk_params, trunk_state
    params["lstm"] = init.reference_lstm(ks[1], FRAME_FEAT_DIM, cfg.hidden_size)
    params["out_linear"] = init.reference_linear(ks[2], cfg.num_classes, cfg.hidden_size)
    return params, state


def apply_fn(params, state, batch, cfg, *, train=False, rng=None):
    video, v_lens = normalize_video(batch["video"]), batch["v_len"]
    frame_mask = length_mask(v_lens, video.shape[1])
    new_state = dict(state)

    # input BN3d over the whole padded clip (models/v_only_cnn2d_lstm.py:73):
    # note the reference normalizes padding zeros too — faithful.
    video, new_state["input_bn"] = batch_norm(
        params["input_bn"], state["input_bn"], video, train=train)

    feats, new_state["trunk"] = frame_trunk(
        params["trunk"], state["trunk"], video, frame_mask, cfg, train=train)
    outs, _ = lstm(params["lstm"], feats, v_lens,
                   use_pallas=cfg.use_pallas_kernels and not train)
    final = last_valid(outs, v_lens)
    return linear(params["out_linear"], final), new_state


register_model("v_only_cnn2d_lstm", init_fn, apply_fn,
               needs_video=True, needs_question=False, uses_stem=False)
