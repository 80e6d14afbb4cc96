"""Question-only bag-of-words classifier.

Reference: QOnlyBOW (models/q_only_bow.py:6-48): Embedding(vocab -> E, pad 0)
-> sum over tokens -> Linear -> 70 logits.

Parity notes:
- the reference's intended mean-pooling is a no-op (the torch.div result is
  discarded, models/q_only_bow.py:45-48), so this is faithfully a SUM of
  embeddings;
- the embedding keeps torch's default N(0,1) init with the padding row zeroed
  (weights_init only touches Linear/Conv, models/q_only_bow.py:23-26).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from videonavqa_tpu.models.base import register_model
from videonavqa_tpu.ops import initializers as init
from videonavqa_tpu.ops.linear import embedding, linear


def init_fn(key, cfg):
    k_embed, k_out = jax.random.split(key)
    embed = init.normal(k_embed, (cfg.vocab_size, cfg.embed_size))
    embed = embed.at[0].set(0.0)  # padding_idx=0
    params = {
        "embed": {"weight": embed},
        "out_linear": init.reference_linear(k_out, cfg.num_classes, cfg.embed_size),
    }
    return params, {}


def apply_fn(params, state, batch, cfg, *, train=False, rng=None):
    emb = embedding(params["embed"], batch["question"], padding_idx=0)
    pooled = jnp.sum(emb, axis=1)
    return linear(params["out_linear"], pooled), state


register_model("bow", init_fn, apply_fn, needs_video=False, needs_question=True, uses_stem=False)
