"""Exactness of the space/width-to-depth relayings of VGG block 1.

These are measured ALTERNATIVES to the plain stem (scripts/stem_s2d_probe.py:
all three lose 0.84-0.93x to XLA's native conv lowering on the v5e — see
PERF.md "batch-1 online stem" for the numbers), kept because the relay math
is the substrate for any future fused block-1 kernel and must stay exact.
Reference stem being re-expressed: eval/q_and_v_eval.py:17,306-310.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videonavqa_tpu.stem.vgg import (
    init_vgg_partial, relay_s2d_block1, relay_s2d_conv1_1, relay_w2d_block1,
    vgg_partial, vgg_partial_s2d, vgg_partial_s2d_block1,
    vgg_partial_w2d_block1)


@pytest.fixture(scope="module")
def setup():
    key = jax.random.PRNGKey(0)
    params = init_vgg_partial(key)
    # nonzero biases so the tiled-bias relay is exercised
    for n in ("conv1_1", "conv1_2"):
        params[n]["bias"] = jax.random.normal(
            jax.random.PRNGKey(len(n)), params[n]["bias"].shape) * 0.1
    x = jnp.asarray(np.random.RandomState(0).rand(2, 16, 24, 3)
                    .astype(np.float32))
    ref = vgg_partial(params, x, dtype=jnp.float32)
    return params, x, ref


@pytest.mark.parametrize("variant", ["s2d_conv1_1", "s2d_block1", "w2d_block1"])
def test_block1_relay_exact(setup, variant):
    params, x, ref = setup
    if variant == "s2d_conv1_1":
        out = vgg_partial_s2d(relay_s2d_conv1_1(params), params, x,
                              dtype=jnp.float32)
    elif variant == "s2d_block1":
        out = vgg_partial_s2d_block1(relay_s2d_block1(params), params, x,
                                     dtype=jnp.float32)
    else:
        out = vgg_partial_w2d_block1(relay_w2d_block1(params), params, x,
                                     dtype=jnp.float32)
    # identical products + structural zeros -> only f32 reassociation noise
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def test_relay_kernels_structural(setup):
    params, _, _ = setup
    rs = relay_s2d_block1(params)
    assert rs["conv1_1"]["weight"].shape == (3, 3, 12, 256)
    assert rs["conv1_2"]["weight"].shape == (3, 3, 256, 256)
    # 4x channel blocks, 9 of 36 tap-blocks populated -> exactly 25% density
    w = np.asarray(rs["conv1_2"]["weight"])
    blocks = w.reshape(3, 3, 4, 64, 4, 64)
    nz = (np.abs(blocks).sum(axis=(3, 5)) > 0).sum()
    assert nz == 9 * 4  # 9 original taps per output phase, 4 phases
    rw = relay_w2d_block1(params)
    assert rw["conv1_1"]["weight"].shape == (3, 3, 6, 128)
    assert rw["conv1_2"]["weight"].shape == (3, 3, 128, 128)
