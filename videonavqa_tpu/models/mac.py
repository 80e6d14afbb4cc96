"""MAC network (Compositional Attention Networks) over the frozen stem.

Reference: MACNetwork + Control/Read/Write/MACUnit (models/mac.py). Pipeline:

  question: Embedding(embed_hidden, pad 0) -> biLSTM(dim) -> lstm_proj(2dim->dim)
  per frame: 3x [conv3x3 -> ELU] knowledge grid (512 -> dim @ 10x13 = 130 cells)
             -> 12-step MAC recurrence (control attention over words, read
             attention over knowledge cells, write) -> concat(memory, q_h)
  tail: LSTM(3dim) over frames -> last-valid gather -> Linear -> ELU -> Linear

TPU mapping: the MAC recurrence carries no state across frames (memory/control
re-init from mem_0/control_0 per frame, models/mac.py:128-155), so all frames
fold into one [B*T] batch; only the cheap tail LSTM scans over frames. The
12-step recurrence is unrolled (static) under jax.checkpoint so the [B*T, 130,
2*dim] read-unit activations are rematerialized instead of stored.

Parity notes:
- init matches torch exactly where the reference's reset() reaches and where it
  doesn't: embed uniform(0,1) (:192), kaiming convs 0 and 2 but DEFAULT torch
  init for conv 4 (:194-197), default LSTM/lstm_proj init (:172-174), xavier
  linear() helpers in the MAC units (:7-13);
- control attention runs over the batch-max question length (pad_packed width);
  padded-but-in-range words see context = lstm_proj bias rows (:210-219);
- variational dropout masks are sampled once per frame and reapplied at every
  step (:122-126,134-152), train mode only;
- self_attention / memory_gate write-unit variants are implemented and default
  off like the reference (:67,106-108).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from videonavqa_tpu.models.base import register_model
from videonavqa_tpu.ops import initializers as init
from videonavqa_tpu.ops.conv import conv2d
from videonavqa_tpu.ops.linear import embedding, linear
from videonavqa_tpu.ops.lstm import bilstm, last_valid, lstm
from videonavqa_tpu.ops.masking import length_mask, mask_invalid

SELF_ATTENTION = False
MEMORY_GATE = False


def init_fn(key, cfg):
    dim = cfg.mac_dim
    ks = jax.random.split(key, 16)
    params = {
        "embed": {"weight": init.uniform(ks[0], (cfg.vocab_size, cfg.embed_size), 0.0, 1.0)},
        "lstm_fwd": init.torch_default_lstm(ks[1], cfg.embed_size, dim),
        "lstm_bwd": init.torch_default_lstm(ks[2], cfg.embed_size, dim),
        "lstm_proj": dict(zip(("weight", "bias"), init.torch_default_linear(ks[3], dim, 2 * dim))),
    }
    # knowledge convs: kaiming for 0 and 2, torch default for the third
    k0w = init.kaiming_uniform(ks[4], (3, 3, cfg.num_input_channels, dim), "hwio")
    k2w = init.kaiming_uniform(ks[5], (3, 3, dim, dim), "hwio")
    params["conv0"] = {"weight": k0w, "bias": jnp.zeros((dim,))}
    params["conv1"] = {"weight": k2w, "bias": jnp.zeros((dim,))}
    cw, cb = init.torch_default_conv2d(ks[6], 3, 3, dim, dim)
    params["conv2"] = {"weight": cw, "bias": cb}

    mac = {
        "position_aware": [init.reference_linear(k, dim, 2 * dim)
                           for k in jax.random.split(ks[7], cfg.mac_max_step)],
        "control_question": init.reference_linear(ks[8], dim, 2 * dim),
        "control_attn": init.reference_linear(ks[9], 1, dim),
        "read_mem": init.reference_linear(ks[10], dim, dim),
        "read_concat": init.reference_linear(ks[11], dim, 2 * dim),
        "read_attn": init.reference_linear(ks[12], 1, dim),
        "write_concat": init.reference_linear(ks[13], dim, 2 * dim),
        "mem_0": jnp.zeros((1, dim)),
        "control_0": jnp.zeros((1, dim)),
    }
    if SELF_ATTENTION:
        k_a, k_m = jax.random.split(ks[14])
        mac["write_attn"] = init.reference_linear(k_a, 1, dim)
        mac["write_mem"] = init.reference_linear(k_m, dim, dim)
    if MEMORY_GATE:
        mac["write_control"] = init.reference_linear(ks[14], 1, dim)
    params["mac"] = mac

    k_c0, k_c2, k_tail = jax.random.split(ks[15], 3)
    params["classifier0"] = {
        "weight": init.kaiming_uniform(k_c0, (2 * dim, 3 * dim), "oi"),
        "bias": jnp.zeros((2 * dim,)),
    }
    params["classifier2"] = init.reference_linear(k_c2, cfg.num_classes, 2 * dim)
    params["lstm_tail"] = init.torch_default_lstm(k_tail, 3 * dim, 3 * dim)
    return params, {}


def _mac_recurrence(mac, context, question, knowledge, word_mask, cfg, *, train, rng):
    """The 12-step MAC cell over a folded [N, ...] batch.

    context:   [N, Tq, dim]   projected biLSTM states
    question:  [N, 2*dim]     biLSTM final states
    knowledge: [N, dim, P]    knowledge grid (P = 130 cells)
    word_mask: [N, Tq]        0 within batch-max words, -inf beyond
    """
    N, _, dim = context.shape
    control = jnp.broadcast_to(mac["control_0"], (N, dim))
    memory = jnp.broadcast_to(mac["mem_0"], (N, dim))

    if train and cfg.mac_dropout > 0.0:
        k_c, k_m = jax.random.split(rng)
        p = 1.0 - cfg.mac_dropout
        control_mask = jax.random.bernoulli(k_c, p, control.shape).astype(jnp.float32) / p
        memory_mask = jax.random.bernoulli(k_m, p, memory.shape).astype(jnp.float32) / p
        control = control * control_mask
        memory = memory * memory_mask
    else:
        control_mask = memory_mask = None

    def control_unit(step_idx, control):
        # ControlUnit (models/mac.py:28-42)
        pa = linear(mac["position_aware"][step_idx], question)
        cq = linear(mac["control_question"], jnp.concatenate([control, pa], axis=1))
        logits = linear(mac["control_attn"], cq[:, None, :] * context)[..., 0] + word_mask
        attn = jax.nn.softmax(logits, axis=1)
        control = jnp.einsum("bt,btd->bd", attn, context)
        if control_mask is not None:
            control = control * control_mask
        return control

    def read_unit(memory, control):
        # ReadUnit (models/mac.py:53-63): memory is the pre-write memory,
        # control the just-updated control.
        mem = linear(mac["read_mem"], memory)[:, :, None]  # [N,dim,1]
        cat = jnp.concatenate([mem * knowledge, knowledge], axis=1)  # [N,2dim,P]
        concat = linear(mac["read_concat"], jnp.swapaxes(cat, 1, 2))  # [N,P,dim]
        rlogits = linear(mac["read_attn"], concat * control[:, None, :])[..., 0]
        rattn = jax.nn.softmax(rlogits, axis=1)  # [N,P]
        return jnp.einsum("bp,bdp->bd", rattn, knowledge)

    if not SELF_ATTENTION and not MEMORY_GATE:
        # Pure (control, memory) -> (control, memory) step: unroll under
        # jax.checkpoint so the [N, P, 2dim] read activations rematerialize.
        def step(step_idx, control, memory):
            control = control_unit(step_idx, control)
            read = read_unit(memory, control)
            memory_new = linear(mac["write_concat"],
                                jnp.concatenate([read, memory], axis=1))
            if memory_mask is not None:
                memory_new = memory_new * memory_mask
            return control, memory_new

        ckpt_step = jax.checkpoint(step, static_argnums=(0,))
        for i in range(cfg.mac_max_step):
            control, memory = ckpt_step(i, control, memory)
        return memory

    # Flag variants keep the full control/memory histories (models/mac.py:82-102).
    controls = [control]
    memories = [memory]
    for i in range(cfg.mac_max_step):
        control = control_unit(i, control)
        controls.append(control)
        read = read_unit(memories[-1], control)
        next_mem = linear(mac["write_concat"], jnp.concatenate([read, memories[-1]], axis=1))
        if SELF_ATTENTION:
            controls_cat = jnp.stack(controls[:-1], axis=2)  # [N,dim,S]
            a = linear(mac["write_attn"],
                       jnp.swapaxes(controls[-1][:, :, None] * controls_cat, 1, 2))
            a = jax.nn.softmax(a, axis=1)  # [N,S,1]
            memories_cat = jnp.stack(memories, axis=2)  # [N,dim,S]
            attn_mem = jnp.einsum("bs,bds->bd", a[..., 0], memories_cat)
            next_mem = linear(mac["write_mem"], attn_mem) + next_mem
        if MEMORY_GATE:
            gate = jax.nn.sigmoid(linear(mac["write_control"], controls[-1]))
            next_mem = gate * memories[-1] + (1 - gate) * next_mem
        memory = next_mem
        if memory_mask is not None:
            memory = memory * memory_mask
        memories.append(memory)
    return memories[-1]


def apply_fn(params, state, batch, cfg, *, train=False, rng=None):
    feats, v_lens = batch["v_features"], batch["v_len"]
    q, q_lens = batch["question"], batch["q_len"]
    B, T = feats.shape[:2]
    dim = cfg.mac_dim
    if rng is None:
        rng = jax.random.PRNGKey(0)

    # Question pipeline (models/mac.py:205-220)
    emb = embedding(params["embed"], q, padding_idx=None)
    serve_pallas = cfg.use_pallas_kernels and not train
    lstm_out, h = bilstm(params["lstm_fwd"], params["lstm_bwd"], emb, q_lens,
                         use_pallas=serve_pallas)
    context = linear(params["lstm_proj"], lstm_out)  # [B,Tq,dim]; pads -> bias rows
    word_mask = jnp.where(jnp.arange(q.shape[1])[None, :] < jnp.max(q_lens), 0.0, -jnp.inf)

    # Knowledge grid for all frames at once (models/mac.py:233-235)
    x = feats.reshape(B * T, *feats.shape[2:])
    dtype = jnp.dtype(cfg.compute_dtype)
    for name in ("conv0", "conv1", "conv2"):
        x = jax.nn.elu(conv2d(params[name], x, dtype=dtype))
    know = jnp.transpose(x, (0, 3, 1, 2)).reshape(B * T, dim, -1)  # [BT,dim,130]

    # Fold frames into the batch for the MAC recurrence.
    rep = lambda a: jnp.repeat(a, T, axis=0)
    memory = _mac_recurrence(
        params["mac"], rep(context), rep(h), know, word_mask, cfg,
        train=train, rng=rng)

    outs = jnp.concatenate([memory, rep(h)], axis=1).reshape(B, T, 3 * dim)
    outs = mask_invalid(outs, v_lens)

    tail, _ = lstm(params["lstm_tail"], outs, v_lens,
                   use_pallas=serve_pallas)
    final = last_valid(tail, v_lens)
    out = jax.nn.elu(linear(params["classifier0"], final))
    return linear(params["classifier2"], out), state


register_model("mac", init_fn, apply_fn,
               needs_video=True, needs_question=True, uses_stem=True)
