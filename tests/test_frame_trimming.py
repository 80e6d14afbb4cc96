"""Length-bucketed frame trimming must be exact: logits from a trimmed
[B, T_c] batch equal the full [B, 35]-container logits when T_c >= batch max.
(For film_attn the trimmed-away frames enter the reference softmax as
zero-feature rows — reproduced by the phantom-frame correction.)"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from videonavqa_tpu.models import ModelConfig, get_model

CFG = ModelConfig(
    num_classes=7, vocab_size=19, embed_size=8, hidden_size=8, at_hidden_size=8,
    num_res_blocks=2, num_res_block_channels=16, num_input_channels=12,
    num_tail_channels=4, mac_dim=8, mac_max_step=2, max_num_frames=10,
    max_q_len=9, compute_dtype="float32")


@pytest.mark.parametrize("name", ["film_gp_pt", "film_attn_pt", "time_multi_hop", "mac"])
def test_trimmed_equals_full(name):
    spec = get_model(name)
    key = jax.random.PRNGKey(0)
    params, state = spec.init(key, CFG)

    B, T_full, T_c = 3, CFG.max_num_frames, 5
    v_len = jnp.array([5, 2, 4])
    feats_full = np.array(jax.random.normal(key, (B, T_full, 10, 13, CFG.num_input_channels)))
    # zero out invalid frames as the loader's fixed container would
    for b in range(B):
        feats_full[b, int(v_len[b]):] = 0.0
    batch = {
        "question": jax.random.randint(key, (B, CFG.max_q_len), 1, CFG.vocab_size),
        "q_len": jnp.array([9, 4, 6]),
        "v_len": v_len,
    }
    rng = jax.random.PRNGKey(1)

    full, _ = spec.apply(params, state, dict(batch, v_features=jnp.asarray(feats_full)),
                         CFG, train=False, rng=rng)
    trimmed, _ = spec.apply(params, state,
                            dict(batch, v_features=jnp.asarray(feats_full[:, :T_c])),
                            CFG, train=False, rng=rng)
    np.testing.assert_allclose(np.asarray(trimmed), np.asarray(full), atol=1e-4)
