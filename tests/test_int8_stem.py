"""Int8 stem: quantization error bounds and layer-structure parity."""

import numpy as np

import jax
import jax.numpy as jnp

from videonavqa_tpu.stem import init_obj_detector, init_vgg_partial, stem_features
from videonavqa_tpu.stem.quant import (
    calibrate_act_scales, quantize_stem, stem_features_int8,
)


def test_int8_stem_close_to_f32():
    key = jax.random.PRNGKey(0)
    vgg_params = init_vgg_partial(key)
    det_params, det_state = init_obj_detector(key, num_filters=32)
    video = jax.random.uniform(key, (2, 3, 160, 208, 3))

    ref = stem_features(vgg_params, det_params, det_state, video, dtype=jnp.float32)

    scales = calibrate_act_scales(vgg_params, det_params, det_state, video)
    assert len(scales) == 10 and all(s > 0 for s in scales.values())

    for act_scales in (None, scales):  # dynamic and calibrated-static modes
        q = quantize_stem(vgg_params, det_params, act_scales=act_scales)
        got = stem_features_int8(q, det_params, det_state, video)
        assert got.shape == ref.shape
        rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
        assert rel < 0.06, rel

    # frozen: no gradient flows
    def loss(v):
        q = quantize_stem(vgg_params, det_params, act_scales=scales)
        return jnp.sum(stem_features_int8(q, det_params, det_state, v))

    g = jax.grad(loss)(video)
    assert float(jnp.abs(g).max()) == 0.0
