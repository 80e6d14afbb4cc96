"""PyTorch-compatible weight initializers.

The reference initializes every model with the same scheme (repeated verbatim in
each file, e.g. models/obj_detector.py:50-67): Xavier-uniform weights with zero
bias for Linear/Conv, Xavier ih / orthogonal hh / forget-gate-bias 1 for LSTMs.
MAC additionally uses Kaiming-uniform (models/mac.py:7-13,191-199) and PyTorch's
default Linear/Conv/LSTM inits for the layers its ``reset()`` does not touch.

Training-dynamics parity requires matching these distributions, so each is
reimplemented here against jax.random with the exact PyTorch fan/gain math.

Layout conventions (used across the framework):
- Linear weights are stored in torch layout ``[out, in]``.
- Conv2D kernels are stored TPU-native ``HWIO``; fan computations account for it.
- Conv3D kernels are stored ``DHWIO``.
- LSTM weights are torch layout ``w_ih [4H, in]``, ``w_hh [4H, H]`` with gate
  order (i, f, g, o).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def _fans(shape: tuple[int, ...], layout: str) -> tuple[int, int]:
    """(fan_in, fan_out) following torch.nn.init._calculate_fan_in_and_fan_out."""
    if layout == "oi":  # linear [out, in]
        return shape[1], shape[0]
    if layout == "hwio":  # conv2d [kh, kw, in, out]
        rf = shape[0] * shape[1]
        return shape[2] * rf, shape[3] * rf
    if layout == "dhwio":  # conv3d [kd, kh, kw, in, out]
        rf = shape[0] * shape[1] * shape[2]
        return shape[3] * rf, shape[4] * rf
    raise ValueError(f"unknown layout {layout!r}")


def xavier_uniform(key, shape, layout: str = "oi", gain: float = 1.0, dtype=jnp.float32):
    """torch.nn.init.xavier_uniform_ (models/obj_detector.py:52)."""
    fan_in, fan_out = _fans(shape, layout)
    bound = gain * math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def kaiming_uniform(key, shape, layout: str = "oi", a: float = 0.0, dtype=jnp.float32):
    """torch.nn.init.kaiming_uniform_ with mode='fan_in', leaky_relu (models/mac.py:194)."""
    fan_in, _ = _fans(shape, layout)
    gain = math.sqrt(2.0 / (1.0 + a * a))
    bound = math.sqrt(3.0) * gain / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def torch_default_linear(key, out_features: int, in_features: int, dtype=jnp.float32):
    """PyTorch's default nn.Linear reset_parameters: kaiming_uniform(a=sqrt(5))
    weights + uniform(+-1/sqrt(fan_in)) bias. Used by reference layers that are
    never re-initialized (e.g. MAC's lstm_proj, models/mac.py:174)."""
    wkey, bkey = jax.random.split(key)
    w = kaiming_uniform(wkey, (out_features, in_features), "oi", a=math.sqrt(5.0), dtype=dtype)
    bound = 1.0 / math.sqrt(in_features)
    b = jax.random.uniform(bkey, (out_features,), dtype, minval=-bound, maxval=bound)
    return w, b


def torch_default_conv2d(key, kh: int, kw: int, cin: int, cout: int, dtype=jnp.float32):
    """PyTorch's default nn.Conv2d init (kaiming_uniform(a=sqrt(5)) + uniform bias).
    Used for MAC's third knowledge conv, which reset() skips (models/mac.py:191-199)."""
    wkey, bkey = jax.random.split(key)
    w = kaiming_uniform(wkey, (kh, kw, cin, cout), "hwio", a=math.sqrt(5.0), dtype=dtype)
    bound = 1.0 / math.sqrt(cin * kh * kw)
    b = jax.random.uniform(bkey, (cout,), dtype, minval=-bound, maxval=bound)
    return w, b


def orthogonal(key, shape, dtype=jnp.float32):
    """torch.nn.init.orthogonal_ (models/obj_detector.py:57). Rows/cols orthonormal."""
    n_rows, n_cols = shape
    flat = (max(n_rows, n_cols), min(n_rows, n_cols))
    a = jax.random.normal(key, flat, dtype)
    q, r = jnp.linalg.qr(a)
    # Sign correction so the distribution is uniform over orthogonal matrices.
    q = q * jnp.sign(jnp.diagonal(r))
    if n_rows < n_cols:
        q = q.T
    return q[:n_rows, :n_cols]


def reference_lstm(key, input_size: int, hidden_size: int, dtype=jnp.float32):
    """The reference's shared LSTM init (models/obj_detector.py:55-66):
    xavier-uniform w_ih, orthogonal w_hh (block-orthogonal per gate is NOT what
    torch does — it orthogonalizes the full [4H, H] matrix), b_ih = 0,
    b_hh = 0 except forget-gate block = 1."""
    k_ih, k_hh = jax.random.split(key)
    w_ih = xavier_uniform(k_ih, (4 * hidden_size, input_size), "oi", dtype=dtype)
    w_hh = orthogonal(k_hh, (4 * hidden_size, hidden_size), dtype=dtype)
    b_ih = jnp.zeros((4 * hidden_size,), dtype)
    b_hh = jnp.zeros((4 * hidden_size,), dtype)
    b_hh = b_hh.at[hidden_size : 2 * hidden_size].set(1.0)
    return {"w_ih": w_ih, "w_hh": w_hh, "b_ih": b_ih, "b_hh": b_hh}


def torch_default_lstm(key, input_size: int, hidden_size: int, dtype=jnp.float32):
    """PyTorch's default nn.LSTM init: all weights and biases uniform(+-1/sqrt(H)).
    Used by MAC's question biLSTM and tail LSTM, which are never re-initialized
    (models/mac.py:172-180)."""
    bound = 1.0 / math.sqrt(hidden_size)
    ks = jax.random.split(key, 4)
    u = lambda k, s: jax.random.uniform(k, s, dtype, minval=-bound, maxval=bound)
    return {
        "w_ih": u(ks[0], (4 * hidden_size, input_size)),
        "w_hh": u(ks[1], (4 * hidden_size, hidden_size)),
        "b_ih": u(ks[2], (4 * hidden_size,)),
        "b_hh": u(ks[3], (4 * hidden_size,)),
    }


def reference_linear(key, out_features: int, in_features: int, dtype=jnp.float32):
    """Xavier-uniform weight + zero bias (models/obj_detector.py:51-53)."""
    w = xavier_uniform(key, (out_features, in_features), "oi", dtype=dtype)
    return {"weight": w, "bias": jnp.zeros((out_features,), dtype)}


def reference_conv2d(key, kh: int, kw: int, cin: int, cout: int, dtype=jnp.float32):
    """Xavier-uniform HWIO conv kernel + zero bias (models/obj_detector.py:51-53)."""
    w = xavier_uniform(key, (kh, kw, cin, cout), "hwio", dtype=dtype)
    return {"weight": w, "bias": jnp.zeros((cout,), dtype)}


def reference_conv3d(key, kd: int, kh: int, kw: int, cin: int, cout: int, dtype=jnp.float32):
    """Xavier-uniform DHWIO conv3d kernel + zero bias.

    Note the reference's weights_init only matches nn.Conv2d, so its Conv3d layers
    actually keep PyTorch defaults (models/v_only_cnn3d.py:42) — we provide both;
    the model picks the faithful one."""
    w = xavier_uniform(key, (kd, kh, kw, cin, cout), "dhwio", dtype=dtype)
    return {"weight": w, "bias": jnp.zeros((cout,), dtype)}


def torch_default_conv3d(key, kd: int, kh: int, kw: int, cin: int, cout: int, dtype=jnp.float32):
    """PyTorch default nn.Conv3d init — what the reference's 3D convs really get,
    because weights_init only tests isinstance(m, nn.Conv2d) (models/v_only_cnn3d.py:42-44)."""
    wkey, bkey = jax.random.split(key)
    w = kaiming_uniform(wkey, (kd, kh, kw, cin, cout), "dhwio", a=math.sqrt(5.0), dtype=dtype)
    bound = 1.0 / math.sqrt(cin * kd * kh * kw)
    b = jax.random.uniform(bkey, (cout,), dtype, minval=-bound, maxval=bound)
    return {"weight": w, "bias": b}


def uniform(key, shape, low: float, high: float, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, minval=low, maxval=high)


def normal(key, shape, std: float = 1.0, dtype=jnp.float32):
    return std * jax.random.normal(key, shape, dtype)
