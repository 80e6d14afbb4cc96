"""Model-zoo smoke + invariance tests on tiny configurations."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from videonavqa_tpu.models import MODEL_REGISTRY, ModelConfig, get_model

TINY = ModelConfig(
    num_classes=7, vocab_size=19, embed_size=8, hidden_size=8, at_hidden_size=8,
    num_res_blocks=2, num_res_block_channels=16, num_input_channels=12,
    num_tail_channels=4, mac_dim=8, mac_max_step=3, max_num_frames=4,
    max_q_len=9, compute_dtype="float32")

STEM_MODELS = ["film_gp_pt", "film_attn_pt", "time_multi_hop", "mac"]
RAW_VIDEO_MODELS = ["v_only_cnn3d", "v_only_cnn2d_lstm", "concat2d", "concat3d"]
Q_ONLY_MODELS = ["bow", "lstm"]


def tiny_batch(key, *, T=4, B=3):
    kq, kv, kf = jax.random.split(key, 3)
    return {
        "question": jax.random.randint(kq, (B, TINY.max_q_len), 1, TINY.vocab_size)
        * (jnp.arange(TINY.max_q_len)[None, :] < jnp.array([[9], [4], [6]])),
        "q_len": jnp.array([9, 4, 6]),
        "v_features": jax.random.normal(kf, (B, T, 10, 13, TINY.num_input_channels)),
        "v_len": jnp.array([4, 2, 3]),
    }


@pytest.mark.parametrize("name", Q_ONLY_MODELS + STEM_MODELS)
def test_model_smoke(name):
    spec = get_model(name)
    key = jax.random.PRNGKey(0)
    params, state = spec.init(key, TINY)
    batch = tiny_batch(key)
    for train in (True, False):
        logits, new_state = spec.apply(params, state, batch, TINY,
                                       train=train, rng=jax.random.PRNGKey(1))
        assert logits.shape == (3, TINY.num_classes)
        assert bool(jnp.all(jnp.isfinite(logits)))
        assert jax.tree_util.tree_structure(new_state) == jax.tree_util.tree_structure(state)


@pytest.mark.parametrize("name", STEM_MODELS)
def test_invalid_frame_invariance(name):
    """Garbage in padded frames must not change logits (fixed-shape masking)."""
    spec = get_model(name)
    key = jax.random.PRNGKey(0)
    params, state = spec.init(key, TINY)
    batch = tiny_batch(key)
    logits1, _ = spec.apply(params, state, batch, TINY, train=True, rng=jax.random.PRNGKey(1))

    vf = np.asarray(batch["v_features"]).copy()
    v_len = np.asarray(batch["v_len"])
    for b in range(vf.shape[0]):
        vf[b, v_len[b]:] = 77.0
    batch2 = dict(batch, v_features=jnp.asarray(vf))
    logits2, _ = spec.apply(params, state, batch2, TINY, train=True, rng=jax.random.PRNGKey(1))
    np.testing.assert_allclose(np.asarray(logits1), np.asarray(logits2), atol=1e-5)


@pytest.mark.parametrize("name", Q_ONLY_MODELS + STEM_MODELS)
def test_grad_flows(name):
    spec = get_model(name)
    key = jax.random.PRNGKey(0)
    params, state = spec.init(key, TINY)
    batch = tiny_batch(key)

    def loss(p):
        logits, _ = spec.apply(p, state, batch, TINY, train=True, rng=jax.random.PRNGKey(1))
        return jnp.mean(logits ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)
    # at least one parameter receives nonzero gradient
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


def test_film_conv1x1_freeze_flag():
    cfg = ModelConfig(**{**TINY.__dict__, "freeze_film_conv1x1": True})
    spec = get_model("film_gp_pt")
    params, state = spec.init(jax.random.PRNGKey(0), cfg)
    batch = tiny_batch(jax.random.PRNGKey(0))

    def loss(p):
        logits, _ = spec.apply(p, state, batch, cfg, train=True, rng=jax.random.PRNGKey(1))
        return jnp.mean(logits ** 2)

    g = jax.grad(loss)(params)
    for k in range(cfg.num_res_blocks):
        assert float(jnp.abs(g["trunk"][f"conv1x1_{k}"]["weight"]).max()) == 0.0
    assert float(jnp.abs(g["trunk"]["conv3x3_0"]["weight"]).max()) > 0.0


@pytest.mark.parametrize("name", RAW_VIDEO_MODELS)
def test_raw_video_models_smoke(name):
    """Full-geometry (160x208x35) smoke for the raw-video models - fwd only."""
    spec = get_model(name)
    key = jax.random.PRNGKey(0)
    cfg = ModelConfig(**{**TINY.__dict__, "max_num_frames": 35, "hidden_size": 128})
    params, state = spec.init(key, cfg)
    B, T = 2, 35
    batch = {
        "video": jax.random.uniform(key, (B, T, 160, 208, 3)),
        "v_len": jnp.array([7, 3]),
        "question": jax.random.randint(key, (B, cfg.max_q_len), 1, cfg.vocab_size),
        "q_len": jnp.array([9, 4]),
    }
    logits, _ = spec.apply(params, state, batch, cfg, train=False, rng=jax.random.PRNGKey(1))
    assert logits.shape == (B, cfg.num_classes)
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_registry_complete():
    expected = {"bow", "lstm", "v_only_cnn3d", "v_only_cnn2d_lstm", "concat2d",
                "concat3d", "film_gp_pt", "film_attn_pt", "time_multi_hop", "mac"}
    assert expected <= set(MODEL_REGISTRY)
