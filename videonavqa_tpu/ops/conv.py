"""NHWC / NDHWC convolution and pooling primitives.

The reference computes in NCHW (PyTorch); on TPU the MXU-friendly layout is
channels-last, so all framework tensors are NHWC (video: [B, T, H, W, C]).
Kernels are HWIO (2D) / DHWIO (3D). PyTorch ``padding=1`` with k=3/stride=1 is
exactly 'SAME'; pooling uses 'VALID' which matches torch's floor behavior
(e.g. MaxPool3d(4,4,4) on 35x80x104 -> 8x20x26, models/v_only_cnn3d.py:21-28).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_DN2D = ("NHWC", "HWIO", "NHWC")
_DN3D = ("NDHWC", "DHWIO", "NDHWC")


def conv2d(params, x, *, stride=(1, 1), padding="SAME", dtype=None):
    """dtype selects the MXU compute precision (bf16 on TPU); the MXU still
    accumulates partial products in f32 internally, and omitting
    preferred_element_type keeps forward/transpose dtypes consistent for AD.

    1x1 stride-1 convs ARE channel matmuls; lowering them via dot_general
    instead of lax.conv avoids the conv tiler's spatial padding at odd grids
    (10x13 trunk planes: ~16% faster, scripts/trunk_gap_probe.py)."""
    w = params["weight"]
    if dtype is not None:
        x, w = x.astype(dtype), w.astype(dtype)
    elif x.dtype != w.dtype:
        w = w.astype(x.dtype)
    if w.shape[0] == 1 and w.shape[1] == 1 and tuple(stride) == (1, 1):
        y = lax.dot_general(x, w[0, 0], (((x.ndim - 1,), (0,)), ((), ())))
    else:
        y = lax.conv_general_dilated(
            x, w, window_strides=stride, padding=padding,
            dimension_numbers=_DN2D,
        )
    b = params.get("bias")
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def conv3d(params, x, *, stride=(1, 1, 1), padding="SAME", dtype=None):
    w = params["weight"]
    if dtype is not None:
        x, w = x.astype(dtype), w.astype(dtype)
    elif x.dtype != w.dtype:
        w = w.astype(x.dtype)
    y = lax.conv_general_dilated(
        x, w, window_strides=stride, padding=padding,
        dimension_numbers=_DN3D,
    )
    b = params.get("bias")
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def max_pool2d(x, window=(2, 2), stride=None):
    """Max pool over H, W of an [..., H, W, C] tensor (VALID, torch floor mode)."""
    stride = stride or window
    nd = x.ndim
    dims = [1] * nd
    strides = [1] * nd
    dims[nd - 3], dims[nd - 2] = window
    strides[nd - 3], strides[nd - 2] = stride
    return lax.reduce_window(x, -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
                             lax.max, tuple(dims), tuple(strides), "VALID")


def max_pool3d(x, window=(2, 2, 2), stride=None):
    """Max pool over D, H, W of an [N, D, H, W, C] tensor (VALID)."""
    stride = stride or window
    dims = (1, *window, 1)
    strides = (1, *stride, 1)
    return lax.reduce_window(x, -jnp.inf, lax.max, dims, strides, "VALID")
