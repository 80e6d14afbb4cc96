"""Question-only LSTM classifier.

Reference: QOnlyLSTM (models/q_only_lstm.py:7-69): Embedding(pad 0) -> 1-layer
LSTM(hidden) over packed sequences -> last-valid-timestep gather -> Linear.

Parity notes:
- init_hidden draws h0/c0 from randn on every batch (models/q_only_lstm.py:50-54)
  — reproduced via ``rng`` (also at eval time, where the reference remains
  stochastic);
- the reference requires batches pre-sorted by descending q_len
  (eval/q_only_eval.py:75-78); the masked scan is order-independent, so no
  sorting happens here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from videonavqa_tpu.models.base import register_model
from videonavqa_tpu.ops import initializers as init
from videonavqa_tpu.ops.linear import embedding, linear
from videonavqa_tpu.ops.lstm import last_valid, lstm


def init_fn(key, cfg):
    k_embed, k_lstm, k_out = jax.random.split(key, 3)
    embed = init.normal(k_embed, (cfg.vocab_size, cfg.embed_size))
    embed = embed.at[0].set(0.0)  # padding_idx=0
    params = {
        "embed": {"weight": embed},
        "lstm": init.reference_lstm(k_lstm, cfg.embed_size, cfg.hidden_size),
        "out_linear": init.reference_linear(k_out, cfg.num_classes, cfg.hidden_size),
    }
    return params, {}


def apply_fn(params, state, batch, cfg, *, train=False, rng=None):
    B = batch["question"].shape[0]
    if rng is None:
        rng = jax.random.PRNGKey(0)
    k_h, k_c = jax.random.split(rng)
    h0 = jax.random.normal(k_h, (B, cfg.hidden_size))
    c0 = jax.random.normal(k_c, (B, cfg.hidden_size))

    emb = embedding(params["embed"], batch["question"], padding_idx=0)
    outs, _ = lstm(params["lstm"], emb, batch["q_len"], h0, c0,
                   use_pallas=cfg.use_pallas_kernels and not train)
    final = last_valid(outs, batch["q_len"])
    return linear(params["out_linear"], final), state


register_model("lstm", init_fn, apply_fn, needs_video=False, needs_question=True, uses_stem=False)
