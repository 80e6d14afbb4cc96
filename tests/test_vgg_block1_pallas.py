"""Exactness of the fused VGG block-1 Pallas kernel (interpret mode).

The kernel is a measured NEGATIVE on the v5e (0.31-0.40x vs XLA's conv
emitter, scripts/stem_block1_pallas_probe.py; PERF.md "batch-1 online
stem") and is not wired into any default path — the test pins its
correctness so the documented experiment stays reproducible.
"""

import jax
import jax.numpy as jnp
import numpy as np

from videonavqa_tpu.kernels.vgg_block1_pallas import (
    vgg_block1_pallas, vgg_partial_w2d_pallas)
from videonavqa_tpu.ops.conv import conv2d, max_pool2d
from videonavqa_tpu.stem.vgg import (
    init_vgg_partial, relay_w2d_block1, vgg_partial)


def test_block1_kernel_exact():
    key = jax.random.PRNGKey(0)
    params = init_vgg_partial(key)
    for n in ("conv1_1", "conv1_2"):
        params[n]["bias"] = jax.random.normal(
            jax.random.PRNGKey(len(n)), params[n]["bias"].shape) * 0.1
    relaid = relay_w2d_block1(params)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 160, 208, 3)
                    .astype(np.float32))

    h = jax.nn.relu(conv2d(params["conv1_1"], x, dtype=jnp.float32))
    h = jax.nn.relu(conv2d(params["conv1_2"], h, dtype=jnp.float32))
    ref_b1 = max_pool2d(h)
    out = vgg_block1_pallas(relaid, x, dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_b1),
                               rtol=2e-5, atol=2e-6)

    full_ref = vgg_partial(params, x, dtype=jnp.float32)
    full = vgg_partial_w2d_pallas(relaid, params, x, dtype=jnp.float32,
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(full), np.asarray(full_ref),
                               rtol=2e-5, atol=2e-6)
