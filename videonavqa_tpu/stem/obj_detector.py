"""ObjDetectCNN — the second stage of the frozen visual stem, and a standalone
27-way multi-label object detector.

Rebuilt from the reference architecture (models/obj_detector.py:5-99):

    BN(128) -> [conv3x3 -> conv3x3 -> BN -> ReLU -> maxpool2] x3
            -> flatten -> FC(tail_hidden) -> BN -> ReLU -> FC(nb_classes)

Notable reference semantics preserved:
- the two convs in each block are back-to-back with NO activation between
  (models/obj_detector.py:72-77);
- in ``pretrained_features`` mode the forward returns after block 3's ReLU,
  *skipping pool3*, giving 512ch @ 10x13 from the VGG stem's 128ch @ 40x52
  (models/obj_detector.py:85-86);
- the eval harness instantiates it with nb_classes=27, num_filters=512,
  tail_hidden_dim=1024, dropout 0, logits=True, loads obj_detect.pt and runs it
  frozen in eval mode (eval/utils.py:42-51).

All frames of a batch are processed as one fused [B*T, ...] NHWC conv stack in
bfloat16 — replacing the reference's per-frame Python loop over the frame axis
(eval/q_and_v_eval.py:101-110).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from videonavqa_tpu.ops import initializers as init
from videonavqa_tpu.ops.conv import conv2d, max_pool2d
from videonavqa_tpu.ops.linear import linear
from videonavqa_tpu.ops.norm import batch_norm, init_bn
from videonavqa_tpu.stem.vgg import vgg_partial


def init_obj_detector(key, nb_classes=27, num_filters=512, tail_hidden_dim=1024,
                      dtype=jnp.float32):
    keys = jax.random.split(key, 8)
    params, state = {}, {}
    params["bn_input"], state["bn_input"] = init_bn(128, dtype)
    cin = 128
    for b, k in zip(range(1, 4), keys[:3]):
        k1, k2 = jax.random.split(k)
        params[f"conv{b}1"] = init.reference_conv2d(k1, 3, 3, cin, num_filters, dtype=dtype)
        params[f"conv{b}2"] = init.reference_conv2d(k2, 3, 3, num_filters, num_filters, dtype=dtype)
        params[f"bn{b}"], state[f"bn{b}"] = init_bn(num_filters, dtype)
        cin = num_filters
    params["fc_tail1"] = init.reference_linear(keys[3], tail_hidden_dim, num_filters * 6 * 5, dtype=dtype)
    params["bn_tail1"], state["bn_tail1"] = init_bn(tail_hidden_dim, dtype)
    params["fc_tail2"] = init.reference_linear(keys[4], nb_classes, tail_hidden_dim, dtype=dtype)
    return params, state


def obj_detector_features(params, state, x, *, dtype=jnp.bfloat16):
    """Pretrained-features mode: [N, 40, 52, 128] -> [N, 10, 13, 512].

    Frozen/eval BN (running stats); returns after block-3 ReLU, skipping pool3.
    """
    h, _ = batch_norm(params["bn_input"], state["bn_input"], x, train=False)
    for b in range(1, 4):
        h = conv2d(params[f"conv{b}1"], h, dtype=dtype)
        h = conv2d(params[f"conv{b}2"], h, dtype=dtype)
        h, _ = batch_norm(params[f"bn{b}"], state[f"bn{b}"], h, train=False)
        h = jax.nn.relu(h)
        if b < 3:
            h = max_pool2d(h)
    return h


def obj_detector(params, state, x, *, train=False, logits=True, dropout_rng=None,
                 tail_dropout_p=0.0, dtype=jnp.bfloat16):
    """Full detector mode: [N, 40, 52, 128] -> [N, nb_classes] (multi-label).

    Returns (out, new_state). Train mode uses batch BN stats so the detector can
    be (re)trained in this framework (the reference trains it offline).
    """
    new_state = dict(state)
    h, new_state["bn_input"] = batch_norm(params["bn_input"], state["bn_input"], x, train=train)
    for b in range(1, 4):
        h = conv2d(params[f"conv{b}1"], h, dtype=dtype)
        h = conv2d(params[f"conv{b}2"], h, dtype=dtype)
        h, new_state[f"bn{b}"] = batch_norm(params[f"bn{b}"], state[f"bn{b}"], h, train=train)
        h = jax.nn.relu(h)
        h = max_pool2d(h)
    # NHWC [N,5,6,F] -> torch flattens NCHW [N,F,6,5]... the reference flattens
    # h.view(N, -1) on a [N, F, 6, 5] tensor (H=6? no: 40x52 -> 20x26 -> 10x13
    # -> 5x6 after pool3, i.e. torch [N, F, 5, 6]); match that memory order so
    # imported fc_tail1 weights line up.
    h = jnp.transpose(h, (0, 3, 1, 2)).reshape(h.shape[0], -1)
    h = linear(params["fc_tail1"], h)
    h, new_state["bn_tail1"] = batch_norm(params["bn_tail1"], state["bn_tail1"], h, train=train)
    h = jax.nn.relu(h)
    if train and tail_dropout_p > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - tail_dropout_p, h.shape)
        h = jnp.where(keep, h / (1.0 - tail_dropout_p), 0.0)
    out = linear(params["fc_tail2"], h)
    if not logits:
        out = jax.nn.sigmoid(out)
    return out, new_state


def stem_features(vgg_params, det_params, det_state, video, *, dtype=jnp.bfloat16,
                  frame_chunk: int | None = None):
    """The full frozen stem over a video batch.

    video: [B, T, 160, 208, 3] float (pixels/255, BGR channel order as stored
    on disk — eval/dataset.py:69-91) -> features [B, T, 10, 13, 512] f32.

    Frames are folded into the batch axis for one fused conv stack (the TPU
    replacement for the reference's per-frame loop, eval/q_and_v_eval.py:101-110)
    and the whole stem runs under stop_gradient (torch.no_grad, :104).

    ``frame_chunk`` caps the peak VGG activation memory by lax.map-ing the conv
    stack over frame chunks (conv1's 64ch @160x208 output is ~4.3 MB/frame in
    bf16 — 2240 unchunked frames at batch 64 alone exceed a 16 GB HBM).
    """
    B, T = video.shape[:2]
    frames = video.reshape(B * T, *video.shape[2:])

    def run(chunk):
        feats = vgg_partial(vgg_params, chunk, dtype=dtype)
        return obj_detector_features(det_params, det_state, feats, dtype=dtype)

    n = B * T
    if frame_chunk is not None and frame_chunk < n:
        pad = (-n) % frame_chunk
        if pad:
            frames = jnp.concatenate(
                [frames, jnp.zeros((pad, *frames.shape[1:]), frames.dtype)])
        chunks = frames.reshape(-1, frame_chunk, *frames.shape[1:])
        feats = jax.lax.map(run, chunks)
        feats = feats.reshape(-1, *feats.shape[2:])[:n]
    else:
        feats = run(frames)
    feats = feats.reshape(B, T, *feats.shape[1:]).astype(jnp.float32)
    return jax.lax.stop_gradient(feats)
