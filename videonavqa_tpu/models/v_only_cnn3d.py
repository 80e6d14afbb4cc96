"""Video-only C3D-style 3D CNN.

Reference: VideoOnlyCNN3D (models/v_only_cnn3d.py:5-81):
BN3d -> conv3d(3->64)+pool(1,2,2) -> conv3d(64->128)+pool(4,4,4)
     -> conv3d(128->128)+pool(4,4,4) -> FC 7680->2048->128->nb_classes.

Parity notes:
- the reference feeds the video as [B, 3, 160, 208, 35], so torch's Conv3d
  treats (H=160, W=208, T=35) as its (D, H, W) volume; pool1 (1,2,2) therefore
  halves the *width and time* axes, giving 160x104x17 -> 40x26x4 -> 10x6x1
  (= 7680 flat). We reproduce that exact geometry in NDHWC;
- v_lens is ignored entirely — padded frames are zeros in the clip
  (eval/dataset.py:81-89) and flow through the convolutions;
- weights_init misses nn.Conv3d (models/v_only_cnn3d.py:42-44), so the 3D convs
  keep PyTorch default init while the FC layers get Xavier/zero-bias.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from videonavqa_tpu.models.base import register_model
from videonavqa_tpu.ops.video import normalize_video
from videonavqa_tpu.ops import initializers as init
from videonavqa_tpu.ops.conv import conv3d, max_pool3d
from videonavqa_tpu.ops.linear import linear
from videonavqa_tpu.ops.norm import batch_norm, init_bn


def init_c3d_trunk(key, cfg):
    """Shared C3D trunk init (also used by concat3d, models/q_concat_cnn3d.py:19-44)."""
    ks = jax.random.split(key, 5)
    params, state = {}, {}
    params["bn_input"], state["bn_input"] = init_bn(3)
    params["conv1"] = init.torch_default_conv3d(ks[0], 3, 3, 3, 3, 64)
    params["bn1"], state["bn1"] = init_bn(64)
    params["conv2"] = init.torch_default_conv3d(ks[1], 3, 3, 3, 64, 128)
    params["bn2"], state["bn2"] = init_bn(128)
    params["conv3a"] = init.torch_default_conv3d(ks[2], 3, 3, 3, 128, 128)
    params["bn3"], state["bn3"] = init_bn(128)
    params["fc6"] = init.reference_linear(ks[3], 2048, 7680)
    params["bn6"], state["bn6"] = init_bn(2048)
    params["fc7"] = init.reference_linear(ks[4], 128, 2048)
    params["bn7"], state["bn7"] = init_bn(128)
    return params, state


def c3d_trunk(params, state, video, cfg, *, train):
    """video [B, 35, 160, 208, 3] -> [B, 128]; returns (h, new_state)."""
    dtype = jnp.dtype(cfg.compute_dtype)
    # Reference volume order: (D, H, W) = (160, 208, 35).
    x = jnp.transpose(video, (0, 2, 3, 1, 4))  # [B,160,208,35,3]
    new_state = dict(state)
    x, new_state["bn_input"] = batch_norm(params["bn_input"], state["bn_input"], x, train=train)

    h = jax.nn.relu(conv3d(params["conv1"], x, dtype=dtype))
    h = max_pool3d(h, (1, 2, 2))
    h, new_state["bn1"] = batch_norm(params["bn1"], state["bn1"], h, train=train)

    h = jax.nn.relu(conv3d(params["conv2"], h, dtype=dtype))
    h = max_pool3d(h, (4, 4, 4))
    h, new_state["bn2"] = batch_norm(params["bn2"], state["bn2"], h, train=train)

    h = jax.nn.relu(conv3d(params["conv3a"], h, dtype=dtype))
    h = max_pool3d(h, (4, 4, 4))
    h, new_state["bn3"] = batch_norm(params["bn3"], state["bn3"], h, train=train)

    # torch flattens [B, C, D, H, W]; transpose so imported fc6 weights line up.
    h = jnp.transpose(h, (0, 4, 1, 2, 3)).reshape(h.shape[0], -1)

    h = jax.nn.relu(linear(params["fc6"], h))
    h, new_state["bn6"] = batch_norm(params["bn6"], state["bn6"], h, train=train)
    h = jax.nn.relu(linear(params["fc7"], h))
    h, new_state["bn7"] = batch_norm(params["bn7"], state["bn7"], h, train=train)
    return h, new_state


def init_fn(key, cfg):
    k_trunk, k_out = jax.random.split(key)
    params, state = init_c3d_trunk(k_trunk, cfg)
    params["fc8"] = init.reference_linear(k_out, cfg.num_classes, 128)
    return params, state


def apply_fn(params, state, batch, cfg, *, train=False, rng=None):
    h, new_state = c3d_trunk(params, state, normalize_video(batch["video"]), cfg, train=train)
    return linear(params["fc8"], h), new_state


register_model("v_only_cnn3d", init_fn, apply_fn,
               needs_video=True, needs_question=False, uses_stem=False)
