"""Jitted train/eval steps.

One compiled XLA program per (model, batch-shape): frozen stem (when used) ->
model forward -> CE loss -> backward -> gradient clipping -> Adam — the whole
of the reference's per-batch work (eval/q_and_v_eval.py:101-139) in a single
device program. Metrics counters (loss sum, hits, predictions) come back as
device arrays; the host only aggregates.

Gradient-clipping semantics (eval/q_and_v_eval.py:136-138,348-351):
- all q_and_v models: global-norm clip at clip_value (torch clip_grad_norm);
- MAC additionally clamps every gradient element to +-1 via parameter hooks
  *before* the global clip;
- the q-only harness clips nothing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from videonavqa_tpu.ops.video import normalize_video
from videonavqa_tpu.train.loss import cross_entropy_loss


def make_optimizer(l_rate: float):
    """Adam with torch defaults; learning rate injectable for the MAC schedule
    (full lr on epoch 0, lr/10 on epoch 1, full lr after — the reference
    assigns its "warmup" only after epoch-0 training,
    eval/q_and_v_eval.py:358-364; PARITY #18)."""
    return optax.inject_hyperparams(optax.adam)(learning_rate=l_rate)


def set_learning_rate(opt_state, l_rate: float):
    # a host numpy scalar, NOT a device array: the rest of opt_state may be a
    # mesh-global pytree (CLI --mesh_devices/--distributed), and a process-
    # local committed device scalar mixed into that donated input would break
    # multi-controller placement; numpy inputs auto-replicate at every call
    import numpy as np

    opt_state.hyperparams["learning_rate"] = np.float32(l_rate)
    return opt_state


def clip_grads(grads, *, clip_value=None, elementwise_clamp=None):
    if elementwise_clamp is not None:
        grads = jax.tree.map(
            lambda g: jnp.clip(g, -elementwise_clamp, elementwise_clamp), grads)
    if clip_value is not None:
        norm = optax.global_norm(grads)
        scale = jnp.minimum(1.0, clip_value / jnp.maximum(norm, 1e-6))
        grads = jax.tree.map(lambda g: g * scale, grads)
    return grads


def _forward(spec, cfg, params, state, batch, rng, *, train, stem_fn=None):
    if stem_fn is not None and spec.uses_stem and "v_features" not in batch:
        batch = dict(batch, v_features=stem_fn(normalize_video(batch["video"])))
    elif "v_features" in batch and batch["v_features"].dtype == jnp.float8_e4m3fn:
        # fp8 feature-cache storage: widen to the compute dtype in-graph (XLA
        # fuses the cast into the first trunk conv)
        batch = dict(batch, v_features=batch["v_features"].astype(
            jnp.dtype(cfg.compute_dtype)))
    return spec.apply(params, state, batch, cfg, train=train, rng=rng)


def make_train_step(spec, cfg, optimizer, *, class_weights=None, reduction="mean",
                    clip_value=None, elementwise_clamp=None, stem_fn=None,
                    donate=True):
    """Returns jitted (params, state, opt_state, batch, rng) ->
    (params, state, opt_state, metrics)."""

    def step(params, state, opt_state, batch, rng):
        def loss_fn(p):
            logits, new_state = _forward(
                spec, cfg, p, state, batch, rng, train=True, stem_fn=stem_fn)
            loss = cross_entropy_loss(
                logits, batch["label"], class_weights=class_weights, reduction=reduction)
            return loss, (logits, new_state)

        (loss, (logits, new_state)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        grads = clip_grads(grads, clip_value=clip_value, elementwise_clamp=elementwise_clamp)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)

        preds = jnp.argmax(logits, axis=-1)
        metrics = {
            "loss": loss,
            "hits": jnp.sum(preds == batch["label"]),
            "preds": preds,
            "grad_norm": optax.global_norm(grads),
        }
        return params, new_state, opt_state, metrics

    donate_argnums = (0, 1, 2) if donate else ()
    return jax.jit(step, donate_argnums=donate_argnums)


def make_eval_step(spec, cfg, *, class_weights=None, reduction="mean", stem_fn=None):
    """Returns jitted (params, state, batch, rng) -> metrics (no state update —
    the reference evaluates under model.eval() + no_grad)."""

    def step(params, state, batch, rng):
        logits, _ = _forward(spec, cfg, params, state, batch, rng, train=False,
                             stem_fn=stem_fn)
        loss = cross_entropy_loss(
            logits, batch["label"], class_weights=class_weights, reduction=reduction,
            valid=batch.get("valid"))
        preds = jnp.argmax(logits, axis=-1)
        return {"loss": loss, "hits": jnp.sum(preds == batch["label"]),
                "preds": preds, "logits": logits}

    return jax.jit(step)
