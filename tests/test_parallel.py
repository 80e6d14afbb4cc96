"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from videonavqa_tpu.models import ModelConfig, get_model
from videonavqa_tpu.parallel import (
    batch_sharding, make_mesh, opt_state_shardings, param_shardings,
)
from videonavqa_tpu.train.step import make_optimizer, make_train_step

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")

CFG = ModelConfig(model="film_gp_pt", num_res_blocks=1, num_res_block_channels=16,
                  num_input_channels=8, num_tail_channels=4, max_num_frames=3,
                  compute_dtype="float32", num_classes=8, vocab_size=17,
                  embed_size=8, hidden_size=8)

# Tiny configs per model family for the DP-equivalence sweep: mac exercises
# per-step variational dropout rng under sharding; film_attn exercises the
# batch-max-dependent attention mask with ragged sharded v_lens.
_DP_CFGS = {
    "film_gp_pt": CFG,
    "film_attn_pt": dataclasses.replace(CFG, model="film_attn_pt",
                                        at_hidden_size=8),
    "mac": dataclasses.replace(CFG, model="mac", mac_dim=16, mac_max_step=3),
}


def _batch(key, B, cfg=CFG, T=3, ragged=False):
    if ragged:
        v_len = (jax.random.randint(key, (B,), 1, T + 1)).astype(jnp.int32)
        q_len = (jax.random.randint(key, (B,), 1, 7)).astype(jnp.int32)
    else:
        v_len = jnp.full((B,), T, jnp.int32)
        q_len = jnp.full((B,), 4, jnp.int32)
    return {
        "v_features": jax.random.normal(key, (B, T, 10, 13, cfg.num_input_channels)),
        "question": jax.random.randint(key, (B, 7), 0, cfg.vocab_size),
        "v_len": v_len,
        "q_len": q_len,
        "label": jax.random.randint(key, (B,), 0, cfg.num_classes),
    }


def _setup(mesh, cfg=CFG):
    spec = get_model(cfg.model)
    params, state = spec.init(jax.random.PRNGKey(0), cfg)
    optimizer = make_optimizer(1e-3)
    opt_state = optimizer.init(params)
    step = make_train_step(spec, cfg, optimizer, reduction="sum", clip_value=1.0,
                           donate=False)
    return spec, params, state, optimizer, opt_state, step


def _shard_all(mesh, params, state, opt_state, batch):
    from jax.sharding import NamedSharding, PartitionSpec as P

    rep = NamedSharding(mesh, P())
    p_shard = param_shardings(params, mesh)
    bspec = batch_sharding(mesh)
    return (jax.device_put(params, p_shard),
            jax.device_put(state, jax.tree.map(lambda _: rep, state)),
            jax.device_put(opt_state,
                           opt_state_shardings(opt_state, params, p_shard, mesh)),
            {k: jax.device_put(v, bspec(v)) for k, v in batch.items()})


@pytest.mark.parametrize("model", sorted(_DP_CFGS))
def test_dp_matches_single_device(model):
    """Sharded DP step must reproduce single-device numerics for every covered
    family — including mac's per-step dropout rng and film_attn's batch-max
    attention mask over ragged sharded v_lens.

    Raw gradients must agree to f32 reassociation noise (the psum tree sums in
    a different order than the sequential batch reduction); post-Adam params
    get a looser bound because the first Adam step normalizes g/sqrt(g^2),
    amplifying that noise to ~2*lr on leaves whose true gradient is ~0."""
    from videonavqa_tpu.train.loss import cross_entropy_loss

    cfg = _DP_CFGS[model]
    mesh = make_mesh(8, model_parallel=1)
    spec, params, state, optimizer, opt_state, step = _setup(mesh, cfg)
    batch = _batch(jax.random.PRNGKey(3), B=16, cfg=cfg,
                   ragged=(model == "film_attn_pt"))
    rng = jax.random.PRNGKey(5)

    # single device
    p1, s1, o1, m1 = step(params, state, opt_state, batch, rng)

    # sharded
    paramsS, stateS, optS, batchS = _shard_all(mesh, params, state, opt_state, batch)
    with mesh:
        p2, s2, o2, m2 = step(paramsS, stateS, optS, batchS, rng)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)

    # raw gradient equivalence (the actual DP contract)
    def loss_fn(p, b):
        logits, _ = spec.apply(p, state, b, cfg, train=True, rng=rng)
        return cross_entropy_loss(logits, b["label"], reduction="sum")

    g1 = jax.jit(jax.grad(loss_fn))(params, batch)
    with mesh:
        g2 = jax.jit(jax.grad(loss_fn))(paramsS, batchS)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-3)

    # post-Adam params within the noise-amplification bound (2*lr = 2e-3)
    for l1, l2 in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=2.5e-3)
    # BN running stats (cross-replica batch stats) must also match
    for l1, l2 in zip(jax.tree.leaves(s1), jax.tree.leaves(s2)):
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-5)


def test_dp_fp8_feature_batch_matches_single_device():
    """fp8 feature-cache batches (train/step widens e4m3 in-graph) shard the
    same as bf16/f32 features: DP step == single-device step bit-for-bit on
    the same fp8 inputs."""
    import ml_dtypes

    mesh = make_mesh(8, model_parallel=1)
    spec, params, state, optimizer, opt_state, step = _setup(mesh, CFG)
    batch = _batch(jax.random.PRNGKey(9), B=16)
    batch["v_features"] = jnp.asarray(
        np.asarray(batch["v_features"]).astype(ml_dtypes.float8_e4m3fn))
    rng = jax.random.PRNGKey(5)

    p1, s1, o1, m1 = step(params, state, opt_state, batch, rng)
    paramsS, stateS, optS, batchS = _shard_all(mesh, params, state, opt_state, batch)
    with mesh:
        p2, s2, o2, m2 = step(paramsS, stateS, optS, batchS, rng)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    for l1, l2 in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=2.5e-3)


def test_eval_step_dp_matches_single_device():
    """make_eval_step under DP sharding == single device (ragged lengths)."""
    from videonavqa_tpu.train.step import make_eval_step

    cfg = _DP_CFGS["film_attn_pt"]
    mesh = make_mesh(8, model_parallel=1)
    spec = get_model(cfg.model)
    params, state = spec.init(jax.random.PRNGKey(0), cfg)
    eval_step = make_eval_step(spec, cfg, reduction="sum")
    batch = _batch(jax.random.PRNGKey(11), B=16, cfg=cfg, ragged=True)
    rng = jax.random.PRNGKey(13)

    m1 = eval_step(params, state, batch, rng)

    from jax.sharding import NamedSharding, PartitionSpec as P
    rep = NamedSharding(mesh, P())
    paramsS = jax.device_put(params, jax.tree.map(lambda _: rep, params))
    stateS = jax.device_put(state, jax.tree.map(lambda _: rep, state))
    bspec = batch_sharding(mesh)
    batchS = {k: jax.device_put(v, bspec(v)) for k, v in batch.items()}
    with mesh:
        m2 = eval_step(paramsS, stateS, batchS, rng)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(m1["preds"]), np.asarray(m2["preds"]))


def test_host_batch_slice_math(monkeypatch):
    """Per-host slices partition the global batch exactly."""
    from videonavqa_tpu.parallel import multihost

    monkeypatch.setattr(jax, "process_count", lambda: 4)
    covered = []
    for pid in range(4):
        monkeypatch.setattr(jax, "process_index", lambda pid=pid: pid)
        start, size = multihost.host_batch_slice(32)
        covered.append((start, size))
    assert covered == [(0, 8), (8, 8), (16, 8), (24, 8)]
    with pytest.raises(AssertionError):
        multihost.host_batch_slice(30)  # not divisible by 4 hosts


def test_host_localize_batch_math(monkeypatch):
    """The python-loader multihost slice: rows, num_valid clamping, and
    non-batch leaves pass through untouched."""
    from videonavqa_tpu.cli.common import host_localize_batch

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    nb = {
        "label": np.arange(8, dtype=np.int32),
        "question": np.arange(8 * 3).reshape(8, 3),
        "num_valid": np.int32(5),  # global: 3 padding rows on the 2nd host
        "scalar_meta": np.float32(1.5),
    }
    out = []
    for pid in range(2):
        monkeypatch.setattr(jax, "process_index", lambda pid=pid: pid)
        out.append(host_localize_batch(dict(nb), 8))
    np.testing.assert_array_equal(out[0]["label"], [0, 1, 2, 3])
    np.testing.assert_array_equal(out[1]["label"], [4, 5, 6, 7])
    np.testing.assert_array_equal(
        np.concatenate([o["question"] for o in out]), nb["question"])
    assert int(out[0]["num_valid"]) == 4  # full slice valid
    assert int(out[1]["num_valid"]) == 1  # 5 - 4 = 1 real row here
    assert all(o["scalar_meta"] == np.float32(1.5) for o in out)


def test_global_batch_from_host_shards_single_process():
    """On one process the host shard IS the global batch; the assembled arrays
    must be 'data'-sharded and value-identical."""
    from videonavqa_tpu.parallel import multihost

    mesh = make_mesh(8, model_parallel=1)
    host_batch = {"x": np.arange(32, dtype=np.float32).reshape(16, 2),
                  "y": np.arange(16, dtype=np.int32)}
    out = multihost.global_batch_from_host_shards(mesh, host_batch)
    for k, v in host_batch.items():
        np.testing.assert_array_equal(np.asarray(out[k]), v)
        assert out[k].sharding.spec[0] == "data"


def test_model_axis_sharding_runs():
    mesh = make_mesh(8, model_parallel=2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    spec, params, state, optimizer, opt_state, step = _setup(mesh)
    p_shard = param_shardings(params, mesh)
    # out_linear weight should actually be sharded over 'model'
    spec_out = p_shard["out_linear"]["weight"].spec
    assert spec_out[0] == "model"

    from jax.sharding import NamedSharding, PartitionSpec as P
    rep = NamedSharding(mesh, P())
    paramsS = jax.device_put(params, p_shard)
    stateS = jax.device_put(state, jax.tree.map(lambda _: rep, state))
    optS = jax.device_put(opt_state, opt_state_shardings(opt_state, params, p_shard, mesh))
    batch = _batch(jax.random.PRNGKey(3), B=8)
    bspec = batch_sharding(mesh)
    batchS = {k: jax.device_put(v, bspec(v)) for k, v in batch.items()}
    with mesh:
        p2, s2, o2, m2 = step(paramsS, stateS, optS, batchS, jax.random.PRNGKey(5))
    assert np.isfinite(float(m2["loss"]))


def test_make_mesh_raises_on_insufficient_devices():
    """make_mesh must error, not silently truncate, when fewer devices exist
    than requested (the round-1 multichip dryrun failure mode)."""
    with pytest.raises(ValueError, match="only"):
        make_mesh(1024)


def test_graft_entry_dryrun():
    """Run the driver's multichip gate exactly as the driver does: in a fresh
    process (also isolates it from the suite's accumulated RSS — in-process
    it intermittently aborts in the compile threadpool on this 1-core host)."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # the gate retries its inner subprocess up to 3x900s itself (CPU-mesh
    # rendezvous flakes), so the outer bound must cover that worst case
    r = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"],
        cwd=repo, capture_output=True, text=True, timeout=3000)
    assert r.returncode == 0, f"rc={r.returncode}\n" + (r.stdout + r.stderr)[-2000:]
    assert "dryrun_multichip(8)" in r.stdout


def test_int8_trunk_dp_eval_matches_single_device():
    """use_int8_trunk under DP sharding: the dynamic per-tensor absmax is a
    global (cross-device) reduce, so the sharded step must reproduce the
    single-device int8 numerics exactly."""
    import dataclasses as dc

    from videonavqa_tpu.train.step import make_eval_step

    cfg = dc.replace(CFG, use_int8_trunk=True)
    mesh = make_mesh(8, model_parallel=1)
    spec = get_model(cfg.model)
    params, state = spec.init(jax.random.PRNGKey(0), cfg)
    eval_step = make_eval_step(spec, cfg, reduction="sum")
    batch = _batch(jax.random.PRNGKey(21), B=16, ragged=True)
    rng = jax.random.PRNGKey(23)

    m1 = eval_step(params, state, batch, rng)

    from jax.sharding import NamedSharding, PartitionSpec as P
    rep = NamedSharding(mesh, P())
    paramsS = jax.device_put(params, jax.tree.map(lambda _: rep, params))
    stateS = jax.device_put(state, jax.tree.map(lambda _: rep, state))
    bspec = batch_sharding(mesh)
    batchS = {k: jax.device_put(v, bspec(v)) for k, v in batch.items()}
    with mesh:
        m2 = eval_step(paramsS, stateS, batchS, rng)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(m1["preds"]), np.asarray(m2["preds"]))


def test_graft_entry_dryrun_wedge_drill():
    """The gate's worst-case drill (round-3 verdict): one inner attempt
    wedges at a collective rendezvous (simulated: the check hangs until the
    orchestrator's attempt bound kills it), and the gate must still finish
    green by retrying ONLY the wedged check — without discarding the checks
    that already passed, and inside a tight budget."""
    import os
    import subprocess
    import sys
    import tempfile
    import time

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    marker = os.path.join(tempfile.mkdtemp(prefix="wedge_"), "hit")
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # force the orchestration (subprocess) path
    env.update({
        "_VNQA_DRYRUN_CHECKS": "train,eval",  # keep the drill cheap
        "_VNQA_DRYRUN_WEDGE": "eval",
        "_VNQA_DRYRUN_WEDGE_MARKER": marker,
        # 110s/attempt, not 60: on the 1-core host a HEALTHY check can blow
        # a 60s bound under suite co-load (observed: full-suite run killed a
        # healthy attempt repeatedly and failed the drill; the same drill
        # passes alone in ~2 min). The wedge still dies fast enough to retry
        # well inside the budget.
        "_VNQA_DRYRUN_ATTEMPT_TIMEOUT": "110",
        "_VNQA_DRYRUN_BUDGET": "420",
    })
    t0 = time.time()
    r = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"],
        cwd=repo, capture_output=True, text=True, timeout=900, env=env)
    dt = time.time() - t0
    assert r.returncode == 0, f"rc={r.returncode}\n" + (r.stdout + r.stderr)[-2000:]
    assert os.path.exists(marker), "the wedge hook never fired"
    assert "dryrun check 'eval' attempt 1" in r.stdout  # killed + retried
    assert "all checks passed ['train', 'eval']" in r.stdout
    assert dt < 480, f"drill took {dt:.0f}s"
