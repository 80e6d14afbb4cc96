"""Late-fusion: C3D video stream || question LSTM stream.

Reference: QConcatCNN3D (models/q_concat_cnn3d.py:9-134): the v_only_cnn3d
trunk to a 128-d video code, question Embedding (no padding_idx) -> LSTM(128)
-> last-valid gather; concat(256) -> FC -> ReLU -> Dropout(0.5) -> Linear.
"""

from __future__ import annotations

import jax.numpy as jnp

import jax

from videonavqa_tpu.models.base import register_model
from videonavqa_tpu.models.concat2d import HIDDEN_SIZE, dropout
from videonavqa_tpu.models.v_only_cnn3d import c3d_trunk, init_c3d_trunk
from videonavqa_tpu.ops.video import normalize_video
from videonavqa_tpu.ops import initializers as init
from videonavqa_tpu.ops.linear import embedding, linear
from videonavqa_tpu.ops.lstm import last_valid, lstm


def init_fn(key, cfg):
    ks = jax.random.split(key, 5)
    params, state = init_c3d_trunk(ks[0], cfg)
    params["embed"] = {"weight": init.normal(ks[1], (cfg.vocab_size, cfg.embed_size))}
    params["q_lstm"] = init.reference_lstm(ks[2], cfg.embed_size, HIDDEN_SIZE)
    params["fc_tail"] = init.reference_linear(ks[3], 2 * HIDDEN_SIZE, 2 * HIDDEN_SIZE)
    params["out_linear"] = init.reference_linear(ks[4], cfg.num_classes, 2 * HIDDEN_SIZE)
    return params, state


def apply_fn(params, state, batch, cfg, *, train=False, rng=None):
    h, new_state = c3d_trunk(params, state, normalize_video(batch["video"]), cfg, train=train)

    emb = embedding(params["embed"], batch["question"], padding_idx=None)
    q_outs, _ = lstm(params["q_lstm"], emb, batch["q_len"],
                     use_pallas=cfg.use_pallas_kernels and not train)
    q_final = last_valid(q_outs, batch["q_len"])

    out = jnp.concatenate([h, q_final], axis=1)
    out = jax.nn.relu(linear(params["fc_tail"], out))
    out = dropout(out, 0.5, rng, train)
    return linear(params["out_linear"], out), new_state


register_model("concat3d", init_fn, apply_fn,
               needs_video=True, needs_question=True, uses_stem=False)
