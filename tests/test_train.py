"""Loss/metrics/checkpoint unit tests (torch/sklearn golden where available)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from videonavqa_tpu.train.loss import cross_entropy_loss
from videonavqa_tpu.train import metrics as M
from videonavqa_tpu.utils import checkpoint as ckpt

torch = pytest.importorskip("torch")


def test_cross_entropy_matches_torch():
    rng = np.random.RandomState(0)
    logits = rng.randn(6, 5).astype(np.float32)
    labels = rng.randint(0, 5, size=6)
    weights = rng.rand(5).astype(np.float32) + 0.1

    for reduction in ["sum", "mean"]:
        for w in [None, weights]:
            ref = torch.nn.functional.cross_entropy(
                torch.from_numpy(logits), torch.from_numpy(labels),
                weight=None if w is None else torch.from_numpy(w),
                reduction=reduction).item()
            got = cross_entropy_loss(
                jnp.asarray(logits), jnp.asarray(labels),
                class_weights=None if w is None else jnp.asarray(w),
                reduction=reduction)
            np.testing.assert_allclose(float(got), ref, rtol=1e-5)


def test_cross_entropy_valid_mask():
    logits = jnp.asarray(np.random.RandomState(1).randn(4, 3).astype(np.float32))
    labels = jnp.asarray([0, 1, 2, 0])
    full = cross_entropy_loss(logits[:3], labels[:3], reduction="sum")
    masked = cross_entropy_loss(logits, labels, reduction="sum",
                                valid=jnp.asarray([True, True, True, False]))
    np.testing.assert_allclose(float(full), float(masked), rtol=1e-6)


def test_f1_matches_sklearn():
    sklearn_metrics = pytest.importorskip("sklearn.metrics")
    rng = np.random.RandomState(2)
    yt = rng.randint(0, 7, 100)
    yp = rng.randint(0, 7, 100)
    for avg in ["weighted", "micro"]:
        ref = sklearn_metrics.f1_score(yt, yp, average=avg)
        np.testing.assert_allclose(M.f1_score(yt, yp, average=avg), ref, rtol=1e-9)


def test_per_class_accuracies():
    yt = np.array([0, 0, 1, 2, 2, 2])
    yp = np.array([0, 1, 1, 2, 0, 2])
    accs = M.per_class_accuracies(yt, yp, 4)
    np.testing.assert_allclose(accs, [0.5, 1.0, 2 / 3, 0.0])


def test_checkpoint_roundtrip(tmp_path):
    import optax

    params = {"a": {"weight": jnp.arange(6.0).reshape(2, 3)},
              "b": [{"w": jnp.ones(4)}, {"w": jnp.zeros(4)}]}
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    path = str(tmp_path / "m.ckpt")
    ckpt.save_checkpoint(path, params=params, state={"bn": {"mean": jnp.ones(3)}},
                         opt_state=opt_state, meta={"epoch": 3, "model": "bow"})

    p2, s2, o2, meta = ckpt.load_checkpoint(
        path, params_template=jax.tree.map(jnp.zeros_like, params),
        state_template={"bn": {"mean": jnp.zeros(3)}},
        opt_template=opt.init(jax.tree.map(jnp.zeros_like, params)))
    assert meta == {"epoch": 3, "model": "bow"}
    np.testing.assert_array_equal(np.asarray(p2["a"]["weight"]), np.arange(6.0).reshape(2, 3))
    np.testing.assert_array_equal(np.asarray(s2["bn"]["mean"]), np.ones(3))
    chex = pytest.importorskip("chex")
    chex.assert_trees_all_equal(o2, opt_state)


def test_epoch_path():
    assert ckpt.epoch_path("dir/model.ckpt", 4) == "dir/e4_model.ckpt"
    assert ckpt.epoch_path("model.ckpt", 0) == "e0_model.ckpt"
