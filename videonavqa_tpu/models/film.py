"""FiLM-conditioned models over the frozen stem: shared trunk + two tails.

Reference classes: FiLMGlobalPoolingPretrainedStem
(models/film_global_pooling_pt_stem.py) and FiLMAttnPretrainedStem
(models/film_attn_pt_stem.py). Shared structure:

  per frame: conv3x3(512->C) -> ReLU -> BN, then N residual FiLM blocks
     res = ReLU(conv1x1(x)); y = conv3x3(res); y = ReLU(alpha*y + beta) + res
  with (alpha, beta) generated from the question.

TPU mapping:
- the trunk's convolutions run once over the folded [B*T] frame batch (the
  MXU-heavy path); per-frame BatchNorm semantics are preserved via
  frame_batch_norm;
- the reference re-encodes the question once per frame with a *carried* LSTM
  state (film_hidden is only reset by the harness's init_hidden, so FiLM values
  drift across the 35 frames — models/film_attn_pt_stem.py:144-181). This is
  question-only computation, so it runs as a cheap lax.scan over frames
  *decoupled from* the conv trunk;
- the attention tail's -2^31 masks, zero-feature frames beyond the batch max,
  and 35-step LSTMCell recurrence follow models/film_attn_pt_stem.py:188-301
  exactly (see ops.masking.attn_frame_mask for the mask quirk).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from videonavqa_tpu.models.base import register_model
from videonavqa_tpu.ops import initializers as init
from videonavqa_tpu.ops.conv import conv2d
from videonavqa_tpu.ops.linear import embedding, linear, linear_chw
from videonavqa_tpu.ops.lstm import last_valid, lstm, lstm_cell
from videonavqa_tpu.ops.masking import attn_frame_mask, length_mask, mask_invalid
from videonavqa_tpu.ops.norm import frame_batch_norm, init_bn
from videonavqa_tpu.utils import constants as C


# ---------------------------------------------------------------------------
# Shared FiLM machinery
# ---------------------------------------------------------------------------

# Folded-row-count ceiling for the fused int8 1x1 Pallas kernel (rows =
# B*T*10*13 at the flagship serving shapes). At or below it the fused kernel
# wins (batch-1 serving 3.5 -> 2.46 ms/video, BENCH_r04 line 4; B=2/9100
# rows: 1.29x); above it XLA's int8 tiling wins (B=3/13650 rows: 0.79x,
# batch 32xT35: 0.45x — the round-4 1004->639 videos/s serving regression).
# Measured crossover between 9100 and 13650 rows by
# scripts/int8_fused_crossover_probe.py on TPU v5e (2026-08-20); the gate
# sits at the largest measured WIN.
INT8_FUSED_MAX_ROWS = 9100


def init_film_trunk(key, cfg):
    """conv_init + bn_init + N x (conv3x3, conv1x1) — models/film_*:39-52,85-108."""
    ch = cfg.num_res_block_channels
    params, state = {}, {}
    key, sub = jax.random.split(key)
    params["conv_init"] = init.reference_conv2d(sub, 3, 3, cfg.num_input_channels, ch)
    params["bn_init"], state["bn_init"] = init_bn(ch)
    for k in range(cfg.num_res_blocks):
        key, k3, k1 = jax.random.split(key, 3)
        params[f"conv3x3_{k}"] = init.reference_conv2d(k3, 3, 3, ch, ch)
        params[f"conv1x1_{k}"] = init.reference_conv2d(k1, 1, 1, ch, ch)
    return params, state


def film_trunk(params, state, feats, film_values, frame_mask, cfg, *, train):
    """feats [B,T,10,13,Cin], film_values [B,T,2*C*N] -> ([B,T,10,13,C], new_state).

    The residual FiLM blocks run over the folded frame batch; gamma/beta are
    sliced per block exactly as the reference advances start_idx
    (models/film_global_pooling_pt_stem.py:200-226).

    Serving (``cfg.use_int8_trunk and not train``): the trunk convs — the
    roofline-dominant FLOPs of every FiLM-family step — run int8
    (ops/quant.py; 1.78x per conv on v5e). Activation scales are DYNAMIC
    per-tensor absmax by default; when ``state['int8_scales']`` is present
    (recorded by a ``cfg.int8_trunk_calibrate`` f32 pass, with 1.25x
    headroom) they are STATIC, removing the per-batch reductions that make
    dynamic int8 latency-bound at batch 1. The calibration pass also records
    the PRE-QUANTIZED int8 kernels (``state['int8_wq']``), so calibrated
    serving skips the per-step weight re-quantization (a full read + round +
    clip over every trunk kernel) and halves the trunk's weight HBM reads.
    BN / FiLM affines / ReLU stay f32."""
    B, T = feats.shape[:2]
    ch = cfg.num_res_block_channels
    dtype = jnp.dtype(cfg.compute_dtype)
    new_state = dict(state)

    calibrate = getattr(cfg, "int8_trunk_calibrate", False) and not train
    int8 = (getattr(cfg, "use_int8_trunk", False) and not train
            and not calibrate)
    block_convs = None
    scales = state.get("int8_scales") if int8 else None
    if calibrate:
        from videonavqa_tpu.ops.quant import quantize_weight_channelwise

        captured = {}
        captured_wq = {}

        def conv(p, x, name):
            captured[name] = 1.25 * jnp.max(jnp.abs(x.astype(jnp.float32)))
            wq, sw = quantize_weight_channelwise(p["weight"])
            captured_wq[name] = {"wq": wq, "scale": sw}
            return conv2d(p, x, dtype=jnp.float32)

        new_state["int8_scales"] = captured  # filled as convs run below
        new_state["int8_wq"] = captured_wq  # pre-quantized serving kernels
    elif int8 and scales is not None:
        from videonavqa_tpu.ops.quant import (
            conv2d_int8_prequant,
            conv2d_int8_static,
        )

        wqs = state.get("int8_wq")
        if wqs is not None:
            # steady state: calibration also recorded the int8 kernels, so
            # the per-step weight re-quantization (a full read+round+clip of
            # every trunk kernel) disappears
            conv = lambda p, x, name: conv2d_int8_prequant(
                wqs[name]["wq"], wqs[name]["scale"], p.get("bias"), x,
                scales[name], out_dtype=dtype)
            fused_rows = B * T * feats.shape[2] * feats.shape[3]
            if (getattr(cfg, "use_pallas_kernels", False)
                    and fused_rows <= INT8_FUSED_MAX_ROWS):
                # 1x1 convs are launch/HBM-bound at SMALL row counts in the
                # XLA int8 path (int8 copy + int32 accumulator round-trip
                # HBM); the fused kernel keeps quantize/matmul/dequant/relu
                # in VMEM and requantizes the residual with the 3x3's
                # calibrated scale in-register, so the 3x3 skips its own
                # quantize pass. At LARGE row counts XLA's tiling wins
                # (measured 2.3x the other way at batch 32xT35 — the round-4
                # 1004->639 videos/s serving regression), so the fused path
                # is gated on the folded row count; see
                # scripts/int8_fused_crossover_probe.py for the measured
                # crossover and INT8_FUSED_MAX_ROWS below.
                from videonavqa_tpu.kernels.int8_matmul_pallas import (
                    matmul_int8_fused_pallas,
                )
                from videonavqa_tpu.ops.quant import conv2d_int8_preq_act

                def block_convs(k, x, p1x1, p3x3):
                    n1, n3 = f"conv1x1_{k}", f"conv3x3_{k}"
                    res, resq = matmul_int8_fused_pallas(
                        x, wqs[n1]["wq"][0, 0], wqs[n1]["scale"],
                        p1x1.get("bias"), scales[n1], relu=True,
                        next_absmax=scales[n3], out_dtype=dtype)
                    y = conv2d_int8_preq_act(
                        wqs[n3]["wq"], wqs[n3]["scale"], p3x3.get("bias"),
                        resq, scales[n3], out_dtype=dtype)
                    return res, y
        else:
            conv = lambda p, x, name: conv2d_int8_static(p, x, scales[name],
                                                         out_dtype=dtype)
    elif int8:
        from videonavqa_tpu.ops.quant import conv2d_int8_dynamic

        conv = lambda p, x, name: conv2d_int8_dynamic(p, x, out_dtype=dtype)
    else:
        conv = lambda p, x, name: conv2d(p, x, dtype=dtype)

    if block_convs is None:
        def block_convs(k, x, p1x1, p3x3):
            res = jax.nn.relu(conv(p1x1, x, f"conv1x1_{k}"))
            return res, conv(p3x3, res, f"conv3x3_{k}")

    x = conv(params["conv_init"], feats.reshape(B * T, *feats.shape[2:]),
             "conv_init")
    x = jax.nn.relu(x)
    x = x.reshape(B, T, *x.shape[1:])
    x, new_state["bn_init"] = frame_batch_norm(
        params["bn_init"], state["bn_init"], x, frame_mask, train=train)
    x = x.reshape(B * T, *x.shape[2:])

    fv = film_values.reshape(B * T, -1)

    def block(k, x, p1x1, p3x3, alphas, betas):
        res, y = block_convs(k, x, p1x1, p3x3)
        # FiLM values are f32; cast to the conv output dtype so the affine +
        # residual chain doesn't silently upcast every block's [B*T,10,13,C]
        # tensor to f32 (2x the inter-op HBM traffic of the whole trunk).
        a = alphas.astype(y.dtype)[:, None, None, :]
        b = betas.astype(y.dtype)[:, None, None, :]
        y = jax.nn.relu(a * y + b)
        return y + res

    if cfg.remat_film_blocks and not calibrate:
        # (capture writes into a dict from inside `block`; under jax.checkpoint
        # the recorded values would come from the discarded inner trace)
        block = jax.checkpoint(block, static_argnums=(0,))

    for k in range(cfg.num_res_blocks):
        p1x1 = params[f"conv1x1_{k}"]
        if cfg.freeze_film_conv1x1:
            p1x1 = jax.lax.stop_gradient(p1x1)
        x = block(k, x, p1x1, params[f"conv3x3_{k}"],
                  fv[:, 2 * k * ch: 2 * k * ch + ch],
                  fv[:, 2 * k * ch + ch: 2 * (k + 1) * ch])
    return x.reshape(B, T, *x.shape[1:]), new_state


def init_film_generator(key, cfg, total_out):
    """Embedding + encoder (LSTM or linear-BoW) + decoder Linear
    (models/film_global_pooling_pt_stem.py:64-79)."""
    k_embed, k_enc, k_dec = jax.random.split(key, 3)
    params = {"embed": {"weight": init.normal(k_embed, (cfg.vocab_size, cfg.embed_size))}}
    if cfg.q_encoder == "lstm":
        params["encoder"] = init.reference_lstm(k_enc, cfg.embed_size, cfg.hidden_size)
    else:
        params["encoder"] = init.reference_linear(k_enc, cfg.hidden_size, cfg.embed_size)
    params["decoder"] = init.reference_linear(k_dec, total_out, cfg.hidden_size)
    return params


def film_values_over_frames(params, q, q_lens, num_frames, cfg, *, padding_idx,
                            use_pallas=False):
    """FiLM (gamma, beta) per frame: [B, T, total_out].

    LSTM encoder: one question re-encode per frame with carried (h, c) —
    the film_hidden drift (models/film_attn_pt_stem.py:154-171). BoW encoder:
    Linear per token -> sum over all 56 positions (bias included per position;
    the intended mean division is discarded, :173-177) — constant over frames.

    ``use_pallas`` (serving only) fuses the whole num_frames * q_len double
    recurrence into one kernel (kernels/film_reencode_pallas.py).
    """
    B = q.shape[0]
    emb = embedding(params["embed"], q, padding_idx=padding_idx)
    if cfg.q_encoder == "lstm":
        if use_pallas:
            from videonavqa_tpu.kernels.film_reencode_pallas import (
                film_reencode_pallas,
            )

            enc = film_reencode_pallas(params["encoder"], emb, q_lens,
                                       num_frames)  # [B,T,H]
        else:
            h0 = jnp.zeros((B, cfg.hidden_size), emb.dtype)
            # the token projection is identical for all 35 re-encodes — hoist
            xw = linear({"weight": params["encoder"]["w_ih"],
                         "bias": params["encoder"]["b_ih"]}, emb)

            def frame_step(carry, _):
                outs, carry = lstm(params["encoder"], emb, q_lens, *carry,
                                   precomputed_xw=xw)
                return carry, last_valid(outs, q_lens)

            _, finals = jax.lax.scan(frame_step, (h0, h0), None,
                                     length=num_frames)
            enc = jnp.moveaxis(finals, 0, 1)  # [B,T,H]
    else:
        enc = jnp.sum(linear(params["encoder"], emb), axis=1)  # [B,H]
        enc = jnp.broadcast_to(enc[:, None, :], (B, num_frames, enc.shape[-1]))
    return jax.nn.relu(linear(params["decoder"], enc))


# ---------------------------------------------------------------------------
# film_gp_pt — global temporal max-pool tail
# ---------------------------------------------------------------------------

def init_film_gp(key, cfg):
    total_out = 2 * cfg.num_res_block_channels * cfg.num_res_blocks
    k_gen, k_trunk, k_tail, k_out = jax.random.split(key, 4)
    params = init_film_generator(k_gen, cfg, total_out)
    trunk_params, trunk_state = init_film_trunk(k_trunk, cfg)
    params["trunk"] = trunk_params
    params["c1x1_tail"] = init.reference_conv2d(
        k_tail, 1, 1, cfg.num_res_block_channels, cfg.num_tail_channels)
    params["out_linear"] = init.reference_linear(
        k_out, cfg.num_classes, C.STEM_OUT_POSITIONS * cfg.num_tail_channels)
    return params, {"trunk": trunk_state}


def apply_film_gp(params, state, batch, cfg, *, train=False, rng=None):
    feats, v_lens = batch["v_features"], batch["v_len"]
    q, q_lens = batch["question"], batch["q_len"]
    B, T = feats.shape[:2]
    frame_mask = length_mask(v_lens, T)

    films = film_values_over_frames(params, q, q_lens, T, cfg, padding_idx=0,
                                    use_pallas=cfg.use_pallas_kernels and not train)
    x, trunk_state = film_trunk(
        params["trunk"], state["trunk"], feats, films, frame_mask, cfg, train=train)

    x = jax.nn.relu(conv2d(params["c1x1_tail"], x.reshape(B * T, *x.shape[2:]),
                           dtype=jnp.dtype(cfg.compute_dtype)))
    x = x.reshape(B, T, *x.shape[1:])
    # Zero-pad invalid frames then global max over frames — matches the
    # reference's cat of zero-padded per-frame rows + max (film_gp:230-235);
    # post-ReLU values are >= 0 so the included zeros are faithful. The max
    # commutes with the torch-CHW feature flatten, so pooling runs on the
    # channels-last tensor and linear_chw supplies the weight-order fixup
    # (no activation transpose).
    x = mask_invalid(x, v_lens)
    pooled = jnp.max(x, axis=1)  # [B, 10, 13, tail_ch]
    return linear_chw(params["out_linear"], pooled), {"trunk": trunk_state}


register_model("film_gp_pt", init_film_gp, apply_film_gp,
               needs_video=True, needs_question=True, uses_stem=True)


# ---------------------------------------------------------------------------
# film_attn_pt — attention-LSTM tail over frames
# ---------------------------------------------------------------------------

def init_film_attn(key, cfg):
    total_out = 2 * cfg.num_res_block_channels * cfg.num_res_blocks
    ks = jax.random.split(key, 7)
    params = init_film_generator(ks[0], cfg, total_out)
    trunk_params, trunk_state = init_film_trunk(ks[1], cfg)
    params["trunk"] = trunk_params
    dim = C.STEM_OUT_POSITIONS * cfg.num_res_block_channels
    params["fc_embed_attn"] = init.reference_linear(ks[2], cfg.at_hidden_size, dim)
    params["fc_attn_1"] = init.reference_linear(ks[3], 1, cfg.at_hidden_size)
    params["fc_hidden_attn"] = init.reference_linear(ks[4], 1, cfg.at_hidden_size)
    params["lstm_attn"] = init.reference_lstm(ks[5], cfg.at_hidden_size, cfg.at_hidden_size)
    params["out_linear"] = init.reference_linear(
        ks[6], cfg.num_classes, cfg.max_num_frames * cfg.at_hidden_size)
    return params, {"trunk": trunk_state}


def apply_film_attn(params, state, batch, cfg, *, train=False, rng=None):
    feats, v_lens = batch["v_features"], batch["v_len"]
    q, q_lens = batch["question"], batch["q_len"]
    B, T = feats.shape[:2]
    frame_mask = length_mask(v_lens, T)

    # film_attn's embedding has NO padding_idx (models/film_attn_pt_stem.py:37).
    films = film_values_over_frames(params, q, q_lens, T, cfg, padding_idx=None,
                                    use_pallas=cfg.use_pallas_kernels and not train)
    x, trunk_state = film_trunk(
        params["trunk"], state["trunk"], feats, films, frame_mask, cfg, train=train)

    # Per-frame feature embedding; invalid frames zero (F.pad, :245-247,253-256).
    # linear_chw contracts the channels-last trunk output directly against
    # the CHW-ordered weight — the activation transpose this replaces was
    # 4.4 ms/step at the flagship batch-32 serving shape (flatten_probe.py).
    all_features = linear_chw(params["fc_embed_attn"], x)  # [B,T,at]
    all_features = mask_invalid(all_features, v_lens)

    # Precomputed per-frame scores: fc_attn_1 on valid entries only; invalid
    # entries stay exactly 0 (torch.zeros container, :276-281) — the linear
    # bias is NOT applied there.
    scores = jnp.where(frame_mask, linear(params["fc_attn_1"], all_features)[..., 0], 0.0)
    mask = attn_frame_mask(v_lens, T)  # [B,T], 0 beyond batch max (quirk)

    # Length-bucketed batches may trim the frame axis to T < max_num_frames.
    # The trimmed-away frames are exactly the reference's "beyond batch max"
    # frames: zero features, zero score, zero mask. They contribute
    #   n_phantom * exp(v_i) to the softmax normalizer and nothing to the
    # context, so the T=35 semantics are reproduced in closed form.
    n_phantom = float(cfg.max_num_frames - T)

    if cfg.use_pallas_kernels and not train:
        from videonavqa_tpu.kernels.attn_tail_pallas import attn_tail_pallas

        hs = attn_tail_pallas(params, all_features, scores, mask,
                              num_steps=cfg.max_num_frames, n_phantom=n_phantom)
        hs = hs.reshape(B, -1)
        return linear(params["out_linear"], hs), {"trunk": trunk_state}

    h0 = jnp.zeros((B, cfg.at_hidden_size))

    def attn_step(carry, _):
        h, c = carry
        v_i = linear(params["fc_hidden_attn"], h)  # [B,1]
        logits = v_i + scores + mask  # [B,T]
        m = jnp.maximum(jnp.max(logits, axis=1, keepdims=True), v_i)
        e = jnp.exp(logits - m)
        denom = jnp.sum(e, axis=1, keepdims=True) + n_phantom * jnp.exp(v_i - m)
        coefs = e / denom
        ctxt = jnp.einsum("bt,bta->ba", coefs, all_features)
        h, c = lstm_cell(params["lstm_attn"], ctxt, h, c)
        return (h, c), h

    # The LSTMCell recurs over all max_num_frames steps regardless of trimming
    # (models/film_attn_pt_stem.py:283-295).
    _, hs = jax.lax.scan(attn_step, (h0, h0), None, length=cfg.max_num_frames)
    hs = jnp.moveaxis(hs, 0, 1).reshape(B, -1)  # [B, max_num_frames*at]
    return linear(params["out_linear"], hs), {"trunk": trunk_state}


register_model("film_attn_pt", init_film_attn, apply_film_attn,
               needs_video=True, needs_question=True, uses_stem=True)
