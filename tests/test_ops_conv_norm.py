"""Conv/pool/BN parity vs torch on NHWC<->NCHW transposed data."""

import numpy as np
import pytest

import jax.numpy as jnp

from videonavqa_tpu.ops import conv as jc
from videonavqa_tpu.ops import norm as jn

torch = pytest.importorskip("torch")


def test_conv2d_same_matches_torch_pad1():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 9, 11, 3).astype(np.float32)  # NHWC
    w = rng.randn(3, 3, 3, 5).astype(np.float32)   # HWIO
    b = rng.randn(5).astype(np.float32)

    ref = torch.nn.functional.conv2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)),
        torch.from_numpy(w.transpose(3, 2, 0, 1)),
        torch.from_numpy(b), padding=1).numpy().transpose(0, 2, 3, 1)

    got = jc.conv2d({"weight": jnp.asarray(w), "bias": jnp.asarray(b)}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-4)


def test_conv3d_and_pool3d_match_torch():
    rng = np.random.RandomState(1)
    x = rng.randn(1, 7, 10, 12, 3).astype(np.float32)  # NDHWC
    w = rng.randn(3, 3, 3, 3, 4).astype(np.float32)    # DHWIO
    b = rng.randn(4).astype(np.float32)

    xt = torch.from_numpy(x.transpose(0, 4, 1, 2, 3))
    ref = torch.nn.functional.conv3d(
        xt, torch.from_numpy(w.transpose(4, 3, 0, 1, 2)), torch.from_numpy(b),
        padding=1)
    ref_pool = torch.nn.functional.max_pool3d(ref, kernel_size=(4, 4, 4)).numpy()

    got = jc.conv3d({"weight": jnp.asarray(w), "bias": jnp.asarray(b)}, jnp.asarray(x))
    got_pool = jc.max_pool3d(got, (4, 4, 4))
    np.testing.assert_allclose(
        np.asarray(got_pool).transpose(0, 4, 1, 2, 3), ref_pool, atol=1e-4)


def test_max_pool2d_odd_dims_floor():
    # 40x52 -> 20x26 -> 10x13, then pooling 10x13 floors to 5x6 like torch
    x = jnp.arange(10 * 13, dtype=jnp.float32).reshape(1, 10, 13, 1)
    got = jc.max_pool2d(x)
    assert got.shape == (1, 5, 6, 1)
    ref = torch.nn.functional.max_pool2d(
        torch.from_numpy(np.asarray(x).transpose(0, 3, 1, 2)), 2).numpy()
    np.testing.assert_array_equal(np.asarray(got).transpose(0, 3, 1, 2), ref)


def test_batch_norm_train_and_eval_match_torch():
    rng = np.random.RandomState(2)
    x = rng.randn(4, 6, 5, 3).astype(np.float32)
    params, state = jn.init_bn(3)
    m = torch.nn.BatchNorm2d(3)

    # two train steps to exercise running-stat EMA
    for i in range(2):
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2) + i)
        m.train()
        ref = m(xt).detach().numpy().transpose(0, 2, 3, 1)
        got, state = jn.batch_norm(params, state, jnp.asarray(x + i), train=True)
        np.testing.assert_allclose(np.asarray(got), ref, atol=1e-4)

    np.testing.assert_allclose(np.asarray(state["mean"]), m.running_mean.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(state["var"]), m.running_var.numpy(), atol=1e-5)

    m.eval()
    ref = m(torch.from_numpy(x.transpose(0, 3, 1, 2))).detach().numpy().transpose(0, 2, 3, 1)
    got, _ = jn.batch_norm(params, state, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-4)


def test_frame_batch_norm_matches_per_frame_torch_loop():
    """frame_batch_norm == applying torch BN2d per frame to the valid slice,
    exactly like the reference's per-frame loop (film_attn_pt_stem.py:201-211)."""
    rng = np.random.RandomState(3)
    B, T, H, W, C = 4, 5, 3, 4, 2
    x = rng.randn(B, T, H, W, C).astype(np.float32)
    v_lens = np.array([5, 3, 3, 1])
    frame_mask = np.arange(T)[None, :] < v_lens[:, None]

    m = torch.nn.BatchNorm2d(C)
    ref = np.zeros_like(x)
    K = v_lens.max()
    m.train()
    for t in range(K):
        ct = int((v_lens > t).sum())  # valid examples are sorted desc by length
        xt = torch.from_numpy(x[:ct, t].transpose(0, 3, 1, 2))
        ref[:ct, t] = m(xt).detach().numpy().transpose(0, 2, 3, 1)

    params, state = jn.init_bn(C)
    got, new_state = jn.frame_batch_norm(
        params, state, jnp.asarray(x), jnp.asarray(frame_mask), train=True)
    got = np.asarray(got) * frame_mask[:, :, None, None, None]
    np.testing.assert_allclose(got, ref, atol=1e-4)
    np.testing.assert_allclose(np.asarray(new_state["mean"]), m.running_mean.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_state["var"]), m.running_var.numpy(), atol=1e-5)


def test_layer_norm_matches_torch():
    rng = np.random.RandomState(4)
    x = rng.randn(3, 7).astype(np.float32)
    params = jn.init_layer_norm(7)
    ref = torch.nn.functional.layer_norm(torch.from_numpy(x), (7,)).numpy()
    got = jn.layer_norm(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5)
