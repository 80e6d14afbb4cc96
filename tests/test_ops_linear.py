"""linear / linear_chw parity: the CHW contraction must equal the torch-order
flatten + Linear it replaces (reference tails flatten NCHW views before their
Linear, e.g. models/film_attn_pt_stem.py:245)."""

import numpy as np
import pytest

import jax.numpy as jnp

from videonavqa_tpu.ops.linear import linear, linear_chw

torch = pytest.importorskip("torch")


def _flatten_chw_np(x):
    # [..., H, W, C] -> [..., C*H*W] in torch (C, H, W) memory order
    perm = tuple(range(x.ndim - 3)) + (x.ndim - 1, x.ndim - 3, x.ndim - 2)
    return np.transpose(x, perm).reshape(*x.shape[:-3], -1)


@pytest.mark.parametrize("lead", [(4,), (3, 5)])
def test_linear_chw_matches_torch_flatten_linear(lead):
    rng = np.random.RandomState(0)
    H, W, C, A = 6, 7, 16, 11
    x = rng.randn(*lead, H, W, C).astype(np.float32)
    w = rng.randn(A, C * H * W).astype(np.float32)
    b = rng.randn(A).astype(np.float32)

    ref = torch.nn.functional.linear(
        torch.from_numpy(_flatten_chw_np(x)),
        torch.from_numpy(w), torch.from_numpy(b)).numpy()

    got = linear_chw({"weight": jnp.asarray(w), "bias": jnp.asarray(b)},
                     jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-5, atol=2e-4)

    # and it agrees with linear() over the explicitly flattened activation
    via_linear = linear({"weight": jnp.asarray(w), "bias": jnp.asarray(b)},
                        jnp.asarray(_flatten_chw_np(x)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(via_linear),
                               rtol=2e-5, atol=2e-4)


def test_linear_chw_no_bias():
    rng = np.random.RandomState(1)
    x = rng.randn(2, 4, 5, 8).astype(np.float32)
    w = rng.randn(3, 8 * 4 * 5).astype(np.float32)
    ref = _flatten_chw_np(x) @ w.T
    got = linear_chw({"weight": jnp.asarray(w)}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-5, atol=2e-4)
