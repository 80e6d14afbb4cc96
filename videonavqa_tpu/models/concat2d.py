"""Late-fusion: per-frame 2D CNN + LSTM video stream || question LSTM stream.

Reference: QConcatCNN2DLSTM (models/q_concat_cnn2d_lstm.py:11-141): the
v_only_cnn2d_lstm trunk (without the input BN3d) in parallel with
Embedding -> LSTM(128) over the question; last-valid gathers from both streams
-> concat(256) -> FC 256->256 -> ReLU -> Dropout(0.5) -> Linear.

Parity notes:
- as committed the reference class is unconstructable (`use_actions` NameError,
  models/q_concat_cnn2d_lstm.py:19 — SURVEY §8.3); the canonical fixed behavior
  here is use_actions=False with no action embedding;
- the question embedding has NO padding_idx (models/q_concat_cnn2d_lstm.py:30),
  so row 0 is a live parameter — preserved;
- the reference sorts by q_len and inverse-permutes (:118-133); masked scans
  make that a no-op here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from videonavqa_tpu.models.base import register_model
from videonavqa_tpu.models.v_only_cnn2d_lstm import FRAME_FEAT_DIM, frame_trunk, init_frame_trunk
from videonavqa_tpu.ops.video import normalize_video
from videonavqa_tpu.ops import initializers as init
from videonavqa_tpu.ops.linear import embedding, linear
from videonavqa_tpu.ops.lstm import last_valid, lstm
from videonavqa_tpu.ops.masking import length_mask

HIDDEN_SIZE = 128


def dropout(x, rate, rng, train):
    if not train or rate <= 0.0 or rng is None:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


def init_fn(key, cfg):
    ks = jax.random.split(key, 6)
    params, state = {}, {}
    params["trunk"], state["trunk"] = init_frame_trunk(ks[0])
    params["v_lstm"] = init.reference_lstm(ks[1], FRAME_FEAT_DIM, HIDDEN_SIZE)
    params["embed"] = {"weight": init.normal(ks[2], (cfg.vocab_size, cfg.embed_size))}
    params["q_lstm"] = init.reference_lstm(ks[3], cfg.embed_size, HIDDEN_SIZE)
    params["fc_tail"] = init.reference_linear(ks[4], 2 * HIDDEN_SIZE, 2 * HIDDEN_SIZE)
    params["out_linear"] = init.reference_linear(ks[5], cfg.num_classes, 2 * HIDDEN_SIZE)
    return params, state


def apply_fn(params, state, batch, cfg, *, train=False, rng=None):
    video, v_lens = normalize_video(batch["video"]), batch["v_len"]
    q, q_lens = batch["question"], batch["q_len"]
    frame_mask = length_mask(v_lens, video.shape[1])
    new_state = dict(state)

    feats, new_state["trunk"] = frame_trunk(
        params["trunk"], state["trunk"], video, frame_mask, cfg, train=train)
    serve_pallas = cfg.use_pallas_kernels and not train
    v_outs, _ = lstm(params["v_lstm"], feats, v_lens, use_pallas=serve_pallas)
    v_final = last_valid(v_outs, v_lens)

    emb = embedding(params["embed"], q, padding_idx=None)
    q_outs, _ = lstm(params["q_lstm"], emb, q_lens, use_pallas=serve_pallas)
    q_final = last_valid(q_outs, q_lens)

    out = jnp.concatenate([v_final, q_final], axis=1)
    out = jax.nn.relu(linear(params["fc_tail"], out))
    out = dropout(out, 0.5, rng, train)
    return linear(params["out_linear"], out), new_state


register_model("concat2d", init_fn, apply_fn,
               needs_video=True, needs_question=True, uses_stem=False)
