"""Model-zoo checkpoint EXPORT (utils/zoo_export.py): framework -> reference
torch state_dicts.

Three guarantees: (1) export -> import round-trips bit-exactly for every zoo
member (the film conv1x1 leaves excepted — reference checkpoints omit them
by construction, SURVEY §8.9); (2) an exported film_gp state_dict loads into
a reference-semantics torch module and reproduces the jax logits (the
interchange actually works, not just the key names); (3) the on-disk
torch.save format matches the reference harness's
({'epoch','model','state_dict'}, eval/q_and_v_eval.py:148-156)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from test_zoo_import import CFG, _TorchFilmGP
from videonavqa_tpu.models import get_model
from videonavqa_tpu.utils.zoo_export import (
    export_model_checkpoint, save_reference_checkpoint,
)
from videonavqa_tpu.utils.zoo_import import import_model_checkpoint, verify_shapes

torch = pytest.importorskip("torch")

ZOO = ["bow", "lstm", "film_gp_pt", "film_attn_pt", "time_multi_hop", "mac",
       "v_only_cnn3d", "v_only_cnn2d_lstm", "concat2d", "concat3d"]


def _leaves(tree):
    return {tuple(str(p) for p in path): np.asarray(leaf)
            for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]}


@pytest.mark.parametrize("name", ZOO)
def test_export_import_roundtrip(name):
    spec = get_model(name)
    params, state = spec.init(jax.random.PRNGKey(3), CFG)
    sd = export_model_checkpoint(name, params, state, CFG)
    params2, state2, missing = import_model_checkpoint(name, sd, CFG)
    verify_shapes(name, params2, state2, CFG)
    if name in ("film_gp_pt", "film_attn_pt", "time_multi_hop"):
        assert missing == [f"trunk/conv1x1_{k}"
                           for k in range(CFG.num_res_blocks)]
    else:
        assert missing == []
    for (got, want) in ((params2, params), (state2, state)):
        a, b = _leaves(got), _leaves(want)
        assert set(a) == set(b)
        for k in a:
            if any("conv1x1" in part for part in k):
                continue  # regenerated from seed, not round-tripped
            np.testing.assert_array_equal(a[k], b[k], err_msg=str(k))


def test_film_gp_export_drives_reference_module():
    """Exported weights load into the reference-semantics torch fixture
    (missing keys are exactly the conv1x1 list layers) and reproduce the
    jax logits on a ragged batch."""
    spec = get_model("film_gp_pt")
    params, state = spec.init(jax.random.PRNGKey(7), CFG)
    sd = export_model_checkpoint("film_gp_pt", params, state, CFG)

    m = _TorchFilmGP(CFG).eval()
    result = m.load_state_dict(
        {k: torch.from_numpy(v) for k, v in sd.items()}, strict=False)
    assert not result.unexpected_keys
    # BN num_batches_tracked buffers ARE exported (the reference's strict
    # load requires them) — only the plain-list conv1x1 layers are missing
    assert all(k.startswith("conv1x1_layers")
               for k in result.missing_keys), result.missing_keys
    with torch.no_grad():  # graft the jax conv1x1 leaves into the fixture
        for k in range(CFG.num_res_blocks):
            p = params["trunk"][f"conv1x1_{k}"]
            m.conv1x1_layers[k].weight.copy_(torch.from_numpy(
                np.ascontiguousarray(
                    np.asarray(p["weight"]).transpose(3, 2, 0, 1))))
            m.conv1x1_layers[k].bias.copy_(
                torch.from_numpy(np.array(p["bias"])))

    rng = np.random.RandomState(1)
    B, T = 3, CFG.max_num_frames
    v_lens = np.array([4, 2, 2])
    q_lens = np.array([3, 9, 1])
    v = rng.randn(B, CFG.num_input_channels, 10, 13, T).astype(np.float32)
    for b in range(B):
        v[b, :, :, :, v_lens[b]:] = 0.0
    q = rng.randint(1, CFG.vocab_size, size=(B, CFG.max_q_len))
    for b in range(B):
        q[b, q_lens[b]:] = 0

    with torch.no_grad():
        ref = m(torch.from_numpy(v), torch.from_numpy(q),
                torch.from_numpy(v_lens), torch.from_numpy(q_lens)).numpy()
    batch = {"v_features": jnp.asarray(v.transpose(0, 4, 2, 3, 1)),
             "question": jnp.asarray(q),
             "v_len": jnp.asarray(v_lens), "q_len": jnp.asarray(q_lens)}
    got, _ = spec.apply(params, state, batch, CFG, train=False,
                        rng=jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-4)


def test_export_checkpoint_cli(tmp_path):
    """The CLI entry point round-trips a framework npz -> reference .pt,
    including q_only models outside the q_and_v parser's default zoo."""
    from videonavqa_tpu.cli import export_checkpoint
    from videonavqa_tpu.cli.common import build_q_and_v_parser, cfg_from_args
    from videonavqa_tpu.utils import checkpoint as ckpt

    args = build_q_and_v_parser().parse_args([])
    cfg = cfg_from_args(args, "lstm")
    spec = get_model("lstm")
    params, state = spec.init(jax.random.PRNGKey(0), cfg)
    npz = str(tmp_path / "m.npz")
    ckpt.save_checkpoint(npz, params=params, state=state, meta={"epoch": 2})
    out = str(tmp_path / "m.pt")
    export_checkpoint.main(["--model", "lstm", "--checkpoint_path", npz,
                            "--out", out])
    obj = torch.load(out, map_location="cpu", weights_only=False)
    assert obj["epoch"] == 2 and obj["model"] == "lstm"
    sd = {k: v.numpy() for k, v in obj["state_dict"].items()}
    params2, _, missing = import_model_checkpoint("lstm", sd, cfg)
    assert missing == []
    for k, a in _leaves(params2).items():
        np.testing.assert_array_equal(a, _leaves(params)[k], err_msg=str(k))


def test_reference_checkpoint_format(tmp_path):
    """save_reference_checkpoint writes the reference harness's exact
    torch.save layout and survives a load -> import cycle."""
    spec = get_model("lstm")
    params, state = spec.init(jax.random.PRNGKey(0), CFG)
    path = str(tmp_path / "q_only.pt")
    save_reference_checkpoint(path, "lstm", params, state, CFG, epoch=4)

    obj = torch.load(path, map_location="cpu", weights_only=False)
    assert obj["epoch"] == 4 and obj["model"] == "lstm"
    sd = {k: v.numpy() for k, v in obj["state_dict"].items()}
    params2, _, missing = import_model_checkpoint("lstm", sd, CFG)
    assert missing == []
    for k, a in _leaves(params2).items():
        np.testing.assert_array_equal(a, _leaves(params)[k], err_msg=str(k))


def test_torch_checkpoint_dropin_load(tmp_path):
    """load_any_checkpoint (utils/checkpoint.py) routes a reference torch
    checkpoint through the golden-tested importer and a framework npz
    through the npz path — --checkpoint_path accepts either format at every
    CLI load site (the reference's torch.load slot,
    eval/q_and_v_eval.py:336-346)."""
    from videonavqa_tpu.utils import checkpoint as ckpt

    spec = get_model("lstm")
    params, state = spec.init(jax.random.PRNGKey(0), CFG)
    pt = str(tmp_path / "ref.pt")
    save_reference_checkpoint(pt, "lstm", params, state, CFG, epoch=4)

    tmpl_p, tmpl_s = spec.init(jax.random.PRNGKey(1), CFG)
    got, _, opt, meta = ckpt.load_any_checkpoint(
        pt, model_name="lstm", cfg=CFG,
        params_template=tmpl_p, state_template=tmpl_s)
    assert meta["epoch"] == 4 and opt is None
    for k, a in _leaves(got).items():
        np.testing.assert_array_equal(a, _leaves(params)[k], err_msg=str(k))

    # npz path: identical API, exact restore incl. meta
    npz = str(tmp_path / "m.npz")
    ckpt.save_checkpoint(npz, params=params, state=state, meta={"epoch": 2})
    got2, _, _, meta2 = ckpt.load_any_checkpoint(
        npz, model_name="lstm", cfg=CFG,
        params_template=tmpl_p, state_template=tmpl_s)
    assert meta2["epoch"] == 2
    for k, a in _leaves(got2).items():
        np.testing.assert_array_equal(a, _leaves(params)[k], err_msg=str(k))


@pytest.fixture(scope="module")
def synth_dir(tmp_path_factory):
    from videonavqa_tpu.data.synthetic import generate_synthetic_dataset

    out = str(tmp_path_factory.mktemp("synth"))
    generate_synthetic_dataset(out, num_houses=3, trajs_per_house=4, seed=0,
                               video_format="mp4", max_frames=40)
    return out


def test_torch_checkpoint_dropin_cli(synth_dir, tmp_path, capsys):
    """End-to-end drop-in: a reference-format .pt drives the actual test
    harness (run_test restores it through the importer and evaluates)."""
    from videonavqa_tpu.cli import q_only_test
    from videonavqa_tpu.cli.common import cfg_from_args
    from videonavqa_tpu.cli.q_only_eval import build_parser

    args = build_parser().parse_args(
        ["--model", "lstm", "--data_dir", synth_dir,
         "--compute_dtype", "float32"])
    cfg = cfg_from_args(args, "lstm")
    spec = get_model("lstm")
    params, state = spec.init(jax.random.PRNGKey(0), cfg)
    pt = str(tmp_path / "lstm_ref.pt")
    save_reference_checkpoint(pt, "lstm", params, state, cfg, epoch=0)

    q_only_test.main(["--model", "lstm", "--data_dir", synth_dir,
                      "--batch_size", "4", "--checkpoint_path", pt,
                      "--num_workers", "2", "--compute_dtype", "float32"])
    out = capsys.readouterr().out
    assert "Testing" in out
