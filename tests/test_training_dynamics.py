"""Training-dynamics parity and sanity: optax-vs-torch Adam goldens, gradient
clipping semantics, and an end-to-end overfit check."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from videonavqa_tpu.models import ModelConfig, get_model
from videonavqa_tpu.train.step import clip_grads, make_optimizer, make_train_step, set_learning_rate

torch = pytest.importorskip("torch")


def test_adam_matches_torch_on_bow():
    """Several BoW training steps must track torch Adam + CE exactly."""
    cfg = ModelConfig(model="bow", num_classes=5, vocab_size=11, embed_size=6)
    spec = get_model("bow")
    params, state = spec.init(jax.random.PRNGKey(0), cfg)

    # mirror in torch
    tm = torch.nn.Module()
    tm.embed = torch.nn.Embedding(11, 6, padding_idx=0)
    tm.out = torch.nn.Linear(6, 5)
    with torch.no_grad():
        tm.embed.weight.copy_(torch.from_numpy(np.array(params["embed"]["weight"])))
        tm.out.weight.copy_(torch.from_numpy(np.array(params["out_linear"]["weight"])))
        tm.out.bias.copy_(torch.from_numpy(np.array(params["out_linear"]["bias"])))
    opt_t = torch.optim.Adam(tm.parameters(), lr=1e-2)

    optimizer = make_optimizer(1e-2)
    opt_state = optimizer.init(params)
    step = make_train_step(spec, cfg, optimizer, reduction="mean", donate=False)

    rng = np.random.RandomState(0)
    for it in range(5):
        q = rng.randint(1, 11, size=(4, 7))
        q[:, 5:] = 0
        y = rng.randint(0, 5, size=4)
        batch = {"question": jnp.asarray(q), "q_len": jnp.full((4,), 5),
                 "label": jnp.asarray(y)}
        params, state, opt_state, metrics = step(
            params, state, opt_state, batch, jax.random.PRNGKey(it))

        opt_t.zero_grad()
        emb = tm.embed(torch.from_numpy(q))
        logits = tm.out(emb.sum(dim=1))
        loss = torch.nn.functional.cross_entropy(logits, torch.from_numpy(y))
        loss.backward()
        opt_t.step()

    np.testing.assert_allclose(np.array(params["embed"]["weight"]),
                               tm.embed.weight.detach().numpy(), atol=2e-5)
    np.testing.assert_allclose(np.array(params["out_linear"]["weight"]),
                               tm.out.weight.detach().numpy(), atol=2e-5)


def test_clip_grads_semantics():
    g = {"a": jnp.array([3.0, 4.0]), "b": jnp.array([[5.0]])}
    # elementwise clamp first (MAC hooks), then global-norm clip
    clipped = clip_grads(g, elementwise_clamp=1.0)
    np.testing.assert_allclose(np.asarray(clipped["a"]), [1.0, 1.0])
    np.testing.assert_allclose(np.asarray(clipped["b"]), [[1.0]])

    clipped = clip_grads(g, clip_value=1.0)
    norm = np.sqrt(9 + 16 + 25)
    np.testing.assert_allclose(np.asarray(clipped["a"]), np.array([3, 4]) / norm,
                               rtol=1e-5)
    # under-norm grads pass through unchanged
    small = {"a": jnp.array([0.1, 0.1])}
    out = clip_grads(small, clip_value=1.0)
    np.testing.assert_allclose(np.asarray(out["a"]), [0.1, 0.1], rtol=1e-5)


def test_sum_vs_mean_reduction_gradient_scale():
    """reduction='sum' gradients are batch_size x the 'mean' gradients
    (SURVEY §8.16 — the presets train with sum)."""
    cfg = ModelConfig(model="bow", num_classes=5, vocab_size=11, embed_size=6)
    spec = get_model("bow")
    params, state = spec.init(jax.random.PRNGKey(0), cfg)
    batch = {"question": jnp.ones((8, 7), jnp.int32), "q_len": jnp.full((8,), 7),
             "label": jnp.zeros((8,), jnp.int32)}

    from videonavqa_tpu.train.loss import cross_entropy_loss

    def grad_for(reduction):
        def loss(p):
            logits, _ = spec.apply(p, state, batch, cfg, train=True,
                                   rng=jax.random.PRNGKey(0))
            return cross_entropy_loss(logits, batch["label"], reduction=reduction)
        return jax.grad(loss)(params)

    g_sum = grad_for("sum")
    g_mean = grad_for("mean")
    np.testing.assert_allclose(np.array(g_sum["out_linear"]["weight"]),
                               8.0 * np.array(g_mean["out_linear"]["weight"]),
                               rtol=1e-5)


def test_mac_lr_warmup():
    optimizer = make_optimizer(1e-3)
    params = {"w": jnp.zeros(3)}
    opt_state = optimizer.init(params)
    opt_state = set_learning_rate(opt_state, 1e-4)
    assert float(opt_state.hyperparams["learning_rate"]) == pytest.approx(1e-4)


def test_mac_lr_schedule_matches_reference():
    """PARITY #18: epoch 0 full lr, epoch 1 lr/10, epochs >= 2 full lr
    (q_and_v_eval.py:358-364 assigns the warmup after epoch-0 training)."""
    from videonavqa_tpu.cli.common import mac_lr_for_epoch

    assert mac_lr_for_epoch(1e-3, 0) == pytest.approx(1e-3)
    assert mac_lr_for_epoch(1e-3, 1) == pytest.approx(1e-4)
    assert mac_lr_for_epoch(1e-3, 2) == pytest.approx(1e-3)
    assert mac_lr_for_epoch(1e-3, 7) == pytest.approx(1e-3)


def test_overfit_tiny_film():
    """A tiny film_gp must drive training loss toward zero on 4 fixed examples
    — end-to-end learning sanity (forward, backward, BN state, Adam)."""
    cfg = ModelConfig(model="film_gp_pt", num_classes=4, vocab_size=13,
                      embed_size=8, hidden_size=8, num_res_blocks=1,
                      num_res_block_channels=16, num_input_channels=8,
                      num_tail_channels=4, max_num_frames=3, max_q_len=6,
                      compute_dtype="float32")
    spec = get_model(cfg.model)
    key = jax.random.PRNGKey(0)
    params, state = spec.init(key, cfg)
    optimizer = make_optimizer(3e-3)
    opt_state = optimizer.init(params)
    step = make_train_step(spec, cfg, optimizer, reduction="mean",
                           clip_value=1.0, donate=False)

    batch = {
        "v_features": jax.random.normal(key, (4, 3, 10, 13, 8)),
        "question": jax.random.randint(key, (4, 6), 1, 13),
        "v_len": jnp.array([3, 2, 3, 1]),
        "q_len": jnp.array([6, 3, 4, 5]),
        "label": jnp.array([0, 1, 2, 3]),
    }
    losses = []
    for it in range(60):
        params, state, opt_state, metrics = step(
            params, state, opt_state, batch, jax.random.PRNGKey(it))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < 0.1 * losses[0], (losses[0], losses[-1])
    assert int(metrics["hits"]) == 4
