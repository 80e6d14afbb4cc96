"""Cross-entropy loss with torch semantics.

Reproduces torch.nn.CrossEntropyLoss(weight=..., reduction=...) exactly
(eval/q_and_v_eval.py:316-321):
- per-example nll scaled by the class weight of the *target* class,
- 'mean' divides by the SUM OF WEIGHTS of the batch targets (not the count),
- 'sum' sums ('elementwise_mean' is the legacy torch alias for 'mean',
  eval/q_and_v_eval.py:55).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cross_entropy_loss(logits, labels, *, class_weights=None, reduction="mean",
                       valid=None):
    """``valid`` (bool [B], optional) excludes padded test-batch rows from both
    the sum and the normalizer (the reference slices them off before the loss,
    eval/q_and_v_test.py:123-127)."""
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(log_probs, labels[:, None], axis=1)[:, 0]
    w = jnp.take(class_weights, labels) if class_weights is not None else jnp.ones_like(nll)
    if valid is not None:
        w = w * valid.astype(w.dtype)
    nll = nll * w
    denom = jnp.sum(w) if class_weights is not None else (
        jnp.sum(valid.astype(jnp.float32)) if valid is not None
        else jnp.float32(labels.shape[0]))
    if reduction == "sum":
        return jnp.sum(nll)
    if reduction in ("mean", "elementwise_mean"):
        return jnp.sum(nll) / denom
    raise ValueError(f"unknown reduction {reduction!r}")
