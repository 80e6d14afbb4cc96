"""Time multi-hop FiLM model.

Reference: TimeMultiHopFiLMPretrainedStem (models/time_multi_hop_pt_stem.py):
the FiLM trunk + global max-pool tail of film_gp, but the FiLM values are
decoded *freshly per res-block per frame* by a multi-hop attention decoder over
the question LSTM states:

  per frame: re-encode question (carried LSTM state) -> rnn_states [B,Tq,H],
             encoded last state -> LayerNorm -> context h := encoded
  per block: p = h (*) rnn_states; coefs = softmax(fc_hidden_attn(p));
             h := coefs^T p;  film = LayerNorm(fc_attn_out(h))
  (models/time_multi_hop_pt_stem.py:124-184)

The whole hop recurrence is question-only, so it is computed for all frames and
blocks in a single lax.scan decoupled from the conv trunk, which then runs as
one folded [B*T] batch.

Parity notes:
- torch's softmax runs over num_words = the *batch's* max q_len (pad_packed
  output width); positions beyond an example's own q_len have
  rnn_states = 0 so their logit is exactly the fc_hidden_attn bias — both
  reproduced by zero-padded masked-LSTM outputs + a -inf mask at t >= max(q_lens);
- the encoder LSTM carry advances once per frame across the batch, like
  film_hidden in the other FiLM models.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from videonavqa_tpu.models.base import register_model
from videonavqa_tpu.models.film import film_trunk, init_film_trunk
from videonavqa_tpu.ops import initializers as init
from videonavqa_tpu.ops.conv import conv2d
from videonavqa_tpu.ops.linear import embedding, linear, linear_chw
from videonavqa_tpu.ops.lstm import last_valid, lstm
from videonavqa_tpu.ops.masking import length_mask, mask_invalid
from videonavqa_tpu.ops.norm import init_layer_norm, layer_norm
from videonavqa_tpu.utils import constants as C


def init_fn(key, cfg):
    total_out = 2 * cfg.num_res_block_channels * cfg.num_res_blocks
    ks = jax.random.split(key, 8)
    params = {
        "embed": {"weight": init.normal(ks[0], (cfg.vocab_size, cfg.embed_size))},
        "q_encoder": init.reference_lstm(ks[1], cfg.embed_size, cfg.hidden_size),
        "encoder_norm": init_layer_norm(cfg.hidden_size),
        "fc_hidden_attn": init.reference_linear(ks[2], 1, cfg.hidden_size),
        "fc_attn_out": init.reference_linear(ks[3], total_out, cfg.hidden_size),
        "decoder_norm": init_layer_norm(total_out),
        "c1x1_tail": init.reference_conv2d(
            ks[4], 1, 1, cfg.num_res_block_channels, cfg.num_tail_channels),
        "out_linear": init.reference_linear(
            ks[5], cfg.num_classes, C.STEM_OUT_POSITIONS * cfg.num_tail_channels),
    }
    trunk_params, trunk_state = init_film_trunk(ks[6], cfg)
    params["trunk"] = trunk_params
    return params, {"trunk": trunk_state}


def _film_values_all_frames(params, q, q_lens, num_frames, cfg,
                            use_pallas=False):
    """[B, T, N_blocks, total_out] of per-frame, per-block FiLM values."""
    B = q.shape[0]
    emb = embedding(params["embed"], q, padding_idx=0)
    h0 = jnp.zeros((B, cfg.hidden_size), emb.dtype)
    xw = linear({"weight": params["q_encoder"]["w_ih"],
                 "bias": params["q_encoder"]["b_ih"]}, emb)
    # softmax over words runs to the batch's max q_len (torch pad_packed width)
    word_mask = jnp.where(
        jnp.arange(q.shape[1])[None, :] < jnp.max(q_lens), 0.0, -jnp.inf)

    def frame_step(carry, _):
        rnn_states, carry = lstm(params["q_encoder"], emb, q_lens, *carry,
                                 precomputed_xw=xw,
                                 use_pallas=use_pallas)  # [B,Tq,H]
        encoded = layer_norm(params["encoder_norm"], last_valid(rnn_states, q_lens))

        h = encoded  # context vector, re-initialized per frame (:157)
        block_values = []
        for _k in range(cfg.num_res_blocks):
            p = h[:, None, :] * rnn_states  # [B,Tq,H]
            logits = linear(params["fc_hidden_attn"], p)[..., 0] + word_mask
            coefs = jax.nn.softmax(logits, axis=1)
            h = jnp.einsum("bt,bth->bh", coefs, p)
            block_values.append(layer_norm(params["decoder_norm"],
                                           linear(params["fc_attn_out"], h)))
        return carry, jnp.stack(block_values, axis=1)  # [B,N,out]

    _, films = jax.lax.scan(frame_step, (h0, h0), None, length=num_frames)
    return jnp.moveaxis(films, 0, 1)  # [B,T,N,out]


def apply_fn(params, state, batch, cfg, *, train=False, rng=None):
    feats, v_lens = batch["v_features"], batch["v_len"]
    q, q_lens = batch["question"], batch["q_len"]
    B, T = feats.shape[:2]
    ch = cfg.num_res_block_channels
    frame_mask = length_mask(v_lens, T)

    films = _film_values_all_frames(
        params, q, q_lens, T, cfg,
        use_pallas=cfg.use_pallas_kernels and not train)  # [B,T,N,out]
    # Block k consumes its own decode's slice [2kC : 2(k+1)C]
    # (models/time_multi_hop_pt_stem.py:227-230); repack into the flat
    # [B,T,2*C*N] layout film_trunk slices with the same arithmetic.
    slices = [films[:, :, k, 2 * k * ch: 2 * (k + 1) * ch]
              for k in range(cfg.num_res_blocks)]
    flat_films = jnp.concatenate(slices, axis=-1)

    x, trunk_state = film_trunk(
        params["trunk"], state["trunk"], feats, flat_films, frame_mask, cfg, train=train)

    x = jax.nn.relu(conv2d(params["c1x1_tail"], x.reshape(B * T, *x.shape[2:]),
                           dtype=jnp.dtype(cfg.compute_dtype)))
    x = x.reshape(B, T, *x.shape[1:])
    # max over frames commutes with the torch-CHW flatten; pool channels-last
    # and let linear_chw supply the weight-order fixup (no activation
    # transpose — see ops/linear.py linear_chw).
    x = mask_invalid(x, v_lens)
    pooled = jnp.max(x, axis=1)  # [B, 10, 13, tail_ch]
    return linear_chw(params["out_linear"], pooled), {"trunk": trunk_state}


register_model("time_multi_hop", init_fn, apply_fn,
               needs_video=True, needs_question=True, uses_stem=True)
