"""Pallas kernels vs their XLA-scan references (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from videonavqa_tpu.kernels.attn_tail_pallas import attn_tail_pallas
from videonavqa_tpu.kernels.lstm_pallas import lstm_pallas
from videonavqa_tpu.models import ModelConfig, get_model
from videonavqa_tpu.ops import initializers as init
from videonavqa_tpu.ops.lstm import lstm


def test_lstm_pallas_matches_scan():
    key = jax.random.PRNGKey(0)
    B, T, E, H = 4, 9, 8, 8
    params = init.reference_lstm(key, E, H)
    x = jax.random.normal(key, (B, T, E))
    lens = jnp.array([9, 4, 1, 7])

    ref_out, (ref_h, ref_c) = lstm(params, x, lens)
    out, (h, c) = lstm_pallas(params, x, lens, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h), np.asarray(ref_h), atol=1e-5)
    np.testing.assert_allclose(np.asarray(c), np.asarray(ref_c), atol=1e-5)


def test_attn_tail_pallas_matches_model():
    """film_attn eval logits with use_pallas_kernels must equal the scan path."""
    cfg = ModelConfig(
        num_classes=7, vocab_size=19, embed_size=8, hidden_size=8, at_hidden_size=8,
        num_res_blocks=1, num_res_block_channels=16, num_input_channels=12,
        num_tail_channels=4, max_num_frames=6, max_q_len=9, compute_dtype="float32")
    spec = get_model("film_attn_pt")
    key = jax.random.PRNGKey(0)
    params, state = spec.init(key, cfg)
    B, T = 3, 4  # trimmed frame axis exercises the phantom correction too
    batch = {
        "v_features": jax.random.normal(key, (B, T, 10, 13, cfg.num_input_channels)),
        "question": jax.random.randint(key, (B, cfg.max_q_len), 1, cfg.vocab_size),
        "v_len": jnp.array([4, 2, 3]),
        "q_len": jnp.array([9, 4, 6]),
    }
    ref, _ = spec.apply(params, state, batch, cfg, train=False,
                        rng=jax.random.PRNGKey(1))

    import sys

    mod = sys.modules["videonavqa_tpu.kernels.attn_tail_pallas"]
    orig = mod.attn_tail_pallas
    mod.attn_tail_pallas = lambda *a, **k: orig(*a, interpret=True, **k)
    try:
        cfg2 = ModelConfig(**{**cfg.__dict__, "use_pallas_kernels": True})
        got, _ = spec.apply(params, state, batch, cfg2, train=False,
                            rng=jax.random.PRNGKey(1))
    finally:
        mod.attn_tail_pallas = orig
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_attn_tail_pallas_direct():
    key = jax.random.PRNGKey(2)
    B, T, A, S = 3, 5, 8, 7
    params = {
        "fc_hidden_attn": init.reference_linear(key, 1, A),
        "lstm_attn": init.reference_lstm(key, A, A),
    }
    feats = jax.random.normal(key, (B, T, A))
    scores = jax.random.normal(key, (B, T))
    mask = jnp.zeros((B, T))
    hs = attn_tail_pallas(params, feats, scores, mask, num_steps=S,
                          n_phantom=2.0, interpret=True)
    assert hs.shape == (B, S, A)
    assert bool(jnp.all(jnp.isfinite(hs)))
