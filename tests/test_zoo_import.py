"""Model-zoo checkpoint import: shape round-trips for every model, plus a
golden logit-parity test of film_gp_pt against a faithful torch fixture
(the reference forward semantics per SURVEY §2.3, built from the published
architecture — per-frame effective-batch loop, carried film_hidden, sliced
gamma/beta, zero-padded temporal max-pool)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from videonavqa_tpu.models import ModelConfig, get_model
from videonavqa_tpu.utils.zoo_import import import_model_checkpoint, verify_shapes

torch = pytest.importorskip("torch")
nn = torch.nn

CFG = ModelConfig(
    num_classes=7, vocab_size=19, embed_size=8, hidden_size=8, at_hidden_size=8,
    num_res_blocks=2, num_res_block_channels=16, num_input_channels=12,
    num_tail_channels=4, mac_dim=8, mac_max_step=3, max_num_frames=4,
    max_q_len=9, compute_dtype="float32")


class _TorchFilmGP(nn.Module):
    """Reference-semantics FiLM-GP fixture at CFG's tiny dimensions."""

    def __init__(self, cfg):
        super().__init__()
        C = cfg.num_res_block_channels
        self.cfg = cfg
        self.embed = nn.Embedding(cfg.vocab_size, cfg.embed_size, padding_idx=0)
        self.conv_init = nn.Conv2d(cfg.num_input_channels, C, 3, padding=1)
        self.bn_init = nn.BatchNorm2d(C)
        total_out = 2 * C * cfg.num_res_blocks
        self.film_layer = nn.ModuleList([
            nn.LSTM(cfg.embed_size, cfg.hidden_size),
            nn.Linear(cfg.hidden_size, total_out)])
        self.film_pipeline = nn.ModuleList(
            [nn.Conv2d(C, C, 3, padding=1) for _ in range(cfg.num_res_blocks)])
        self.conv1x1_layers = nn.ModuleList(
            [nn.Conv2d(C, C, 1) for _ in range(cfg.num_res_blocks)])
        self.c1x1_tail = nn.Conv2d(C, cfg.num_tail_channels, 1)
        self.out_linear = nn.Linear(130 * cfg.num_tail_channels, cfg.num_classes)

    def compute_film_values(self, q, q_lens, hidden, ct):
        B = q.shape[0]
        emb = self.embed(q)
        slens, perm = q_lens.sort(0, descending=True)
        x = emb[perm].permute(1, 0, 2)
        packed = nn.utils.rnn.pack_padded_sequence(x, slens.numpy())
        out, hidden = self.film_layer[0](packed, hidden)
        out, _ = nn.utils.rnn.pad_packed_sequence(out)
        _, invperm = perm.sort(0)
        out = out.permute(1, 0, 2)[invperm]
        idx = q_lens.view(B, 1, 1).expand(B, 1, self.cfg.hidden_size) - 1
        final = out.gather(1, idx).view(B, self.cfg.hidden_size)[:ct]
        return torch.relu(self.film_layer[1](final)), hidden

    def forward(self, v, q, v_lens, q_lens):
        # v: [B, C_in, 10, 13, T], sorted desc by v_lens
        B, T = v.shape[0], v.shape[-1]
        C = self.cfg.num_res_block_channels
        hidden = (torch.zeros(1, B, self.cfg.hidden_size),
                  torch.zeros(1, B, self.cfg.hidden_size))
        feats = []
        ct = B
        for i in range(T):
            while ct >= 0 and v_lens[ct - 1] < i + 1:
                ct -= 1
            if ct == -1:
                break
            x = v[:ct, :, :, :, i]
            x = self.bn_init(torch.relu(self.conv_init(x)))
            film, hidden = self.compute_film_values(q, q_lens, hidden, ct)
            start = 0
            for k, conv3 in enumerate(self.film_pipeline):
                res = torch.relu(self.conv1x1_layers[k](x))
                y = conv3(res)
                a = film[:, start:start + C].view(ct, C, 1, 1)
                b = film[:, start + C:start + 2 * C].view(ct, C, 1, 1)
                start += 2 * C
                x = torch.relu(a * y + b) + res
            x = torch.relu(self.c1x1_tail(x))
            x = x.reshape(1, ct, -1)
            x = torch.nn.functional.pad(x, (0, 0, 0, B - ct))
            feats.append(x)
        pooled = torch.max(torch.cat(feats, dim=0), dim=0)[0]
        return self.out_linear(pooled)


def test_film_gp_golden_parity():
    torch.manual_seed(0)
    m = _TorchFilmGP(CFG).eval()
    with torch.no_grad():  # randomize BN stats so eval-mode BN is non-trivial
        m.bn_init.running_mean.uniform_(-0.2, 0.2)
        m.bn_init.running_var.uniform_(0.9, 1.2)

    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()
          if not k.startswith("conv1x1_layers")}
    params, state, missing = import_model_checkpoint("film_gp_pt", sd, CFG)
    assert missing == ["trunk/conv1x1_0", "trunk/conv1x1_1"]
    verify_shapes("film_gp_pt", params, state, CFG)
    # inject the fixture's conv1x1 weights (reference checkpoints omit them)
    for k in range(CFG.num_res_blocks):
        w = m.conv1x1_layers[k].weight.detach().numpy().transpose(2, 3, 1, 0)
        params["trunk"][f"conv1x1_{k}"] = {
            "weight": jnp.asarray(w),
            "bias": jnp.asarray(m.conv1x1_layers[k].bias.detach().numpy())}

    rng = np.random.RandomState(0)
    B, T = 3, CFG.max_num_frames
    v_lens = np.array([4, 3, 1])  # sorted desc as the reference requires
    q_lens = np.array([5, 9, 2])
    v = rng.randn(B, CFG.num_input_channels, 10, 13, T).astype(np.float32)
    for b in range(B):
        v[b, :, :, :, v_lens[b]:] = 0.0
    q = rng.randint(1, CFG.vocab_size, size=(B, CFG.max_q_len))
    for b in range(B):
        q[b, q_lens[b]:] = 0

    with torch.no_grad():
        ref = m(torch.from_numpy(v), torch.from_numpy(q),
                torch.from_numpy(v_lens), torch.from_numpy(q_lens)).numpy()

    spec = get_model("film_gp_pt")
    batch = {
        "v_features": jnp.asarray(v.transpose(0, 4, 2, 3, 1)),  # -> [B,T,10,13,C]
        "question": jnp.asarray(q),
        "v_len": jnp.asarray(v_lens),
        "q_len": jnp.asarray(q_lens),
    }
    got, _ = spec.apply(params, state, batch, CFG, train=False,
                        rng=jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-4)


@pytest.mark.parametrize("name", ["bow", "lstm", "film_attn_pt", "time_multi_hop",
                                  "mac", "v_only_cnn3d", "v_only_cnn2d_lstm",
                                  "concat2d", "concat3d"])
def test_import_shapes_roundtrip(name):
    """Import from a synthetic state_dict whose arrays come from a fresh init's
    shapes — verifies every mapping path exists and shapes line up."""
    spec = get_model(name)
    params, state = spec.init(jax.random.PRNGKey(0), CFG)
    sd = _make_fake_state_dict(name, CFG)
    params2, state2, _ = import_model_checkpoint(name, sd, CFG)
    verify_shapes(name, params2, state2, CFG)


def _make_fake_state_dict(name, cfg):
    """Build a torch state_dict with reference layer names/shapes via small
    torch modules assembled per the published architectures."""
    C = cfg.num_res_block_channels
    mods = {}

    def lstm(prefix, din, dh, bidir=False):
        m = nn.LSTM(din, dh, bidirectional=bidir)
        for k, v in m.state_dict().items():
            mods[f"{prefix}.{k}"] = v

    def lin(prefix, din, dout):
        m = nn.Linear(din, dout)
        for k, v in m.state_dict().items():
            mods[f"{prefix}.{k}"] = v

    def conv(prefix, cin, cout, k=3, three_d=False):
        m = nn.Conv3d(cin, cout, k, padding=k // 2) if three_d else \
            nn.Conv2d(cin, cout, k, padding=k // 2)
        for kk, v in m.state_dict().items():
            mods[f"{prefix}.{kk}"] = v

    def bn(prefix, c):
        m = nn.BatchNorm2d(c)
        for k, v in m.state_dict().items():
            if "num_batches" in k:
                continue
            mods[f"{prefix}.{k}"] = v

    def embed(prefix, v, e):
        mods[f"{prefix}.weight"] = torch.randn(v, e)

    def frame_trunk(prefix):
        chans = [3, 16, 32, 64, 128, 128]
        for i, idx in enumerate((0, 4, 8, 12, 16)):
            conv(f"{prefix}.{idx}", chans[i], chans[i + 1])
            bn(f"{prefix}.{idx + 1}", chans[i + 1])

    def c3d():
        bn("bn_input", 3)
        conv("conv1", 3, 64, three_d=True)
        bn("bn1", 64)
        conv("conv2", 64, 128, three_d=True)
        bn("bn2", 128)
        conv("conv3a", 128, 128, three_d=True)
        bn("bn3", 128)
        lin("fc6", 7680, 2048)
        bn("bn6", 2048)
        lin("fc7", 2048, 128)
        bn("bn7", 128)

    if name == "bow":
        embed("embed", cfg.vocab_size, cfg.embed_size)
        lin("out_linear", cfg.embed_size, cfg.num_classes)
    elif name == "lstm":
        embed("embed", cfg.vocab_size, cfg.embed_size)
        lstm("lstm", cfg.embed_size, cfg.hidden_size)
        lin("out_linear", cfg.hidden_size, cfg.num_classes)
    elif name == "v_only_cnn3d":
        c3d()
        lin("fc8", 128, cfg.num_classes)
    elif name == "v_only_cnn2d_lstm":
        bn("input_bn", 3)
        frame_trunk("per_frame_feature_extractor")
        lstm("lstm", 128 * 5 * 6, cfg.hidden_size)
        lin("out_linear", cfg.hidden_size, cfg.num_classes)
    elif name == "concat2d":
        frame_trunk("per_frame_feature_extractor")
        lstm("v_lstm", 128 * 5 * 6, 128)
        embed("embed", cfg.vocab_size, cfg.embed_size)
        lstm("q_lstm", cfg.embed_size, 128)
        lin("fc_tail", 256, 256)
        lin("out_linear", 256, cfg.num_classes)
    elif name == "concat3d":
        c3d()
        embed("embed", cfg.vocab_size, cfg.embed_size)
        lstm("q_lstm", cfg.embed_size, 128)
        lin("fc_tail", 256, 256)
        lin("out_linear", 256, cfg.num_classes)
    elif name in ("film_attn_pt", "film_gp_pt"):
        embed("embed", cfg.vocab_size, cfg.embed_size)
        lstm("film_layer.0", cfg.embed_size, cfg.hidden_size)
        lin("film_layer.1", cfg.hidden_size, 2 * C * cfg.num_res_blocks)
        conv("conv_init", cfg.num_input_channels, C)
        bn("bn_init", C)
        for k in range(cfg.num_res_blocks):
            conv(f"film_pipeline.{k}", C, C)
        if name == "film_gp_pt":
            conv("c1x1_tail", C, cfg.num_tail_channels, k=1)
            lin("out_linear", 130 * cfg.num_tail_channels, cfg.num_classes)
        else:
            lin("fc_embed_attn", 130 * C, cfg.at_hidden_size)
            lin("fc_attn_1", cfg.at_hidden_size, 1)
            lin("fc_hidden_attn", cfg.at_hidden_size, 1)
            cell = nn.LSTMCell(cfg.at_hidden_size, cfg.at_hidden_size)
            for k, v in cell.state_dict().items():
                mods[f"lstm_attn.{k}"] = v
            lin("out_linear", cfg.max_num_frames * cfg.at_hidden_size, cfg.num_classes)
    elif name == "time_multi_hop":
        total = 2 * C * cfg.num_res_blocks
        embed("embed", cfg.vocab_size, cfg.embed_size)
        lstm("q_encoder", cfg.embed_size, cfg.hidden_size)
        mods["encoder_norm.weight"] = torch.ones(cfg.hidden_size)
        mods["encoder_norm.bias"] = torch.zeros(cfg.hidden_size)
        lin("fc_hidden_attn", cfg.hidden_size, 1)
        lin("fc_attn_out", cfg.hidden_size, total)
        mods["decoder_norm.weight"] = torch.ones(total)
        mods["decoder_norm.bias"] = torch.zeros(total)
        conv("conv_init", cfg.num_input_channels, C)
        bn("bn_init", C)
        for k in range(cfg.num_res_blocks):
            conv(f"film_pipeline.{k}", C, C)
        conv("c1x1_tail", C, cfg.num_tail_channels, k=1)
        lin("out_linear", 130 * cfg.num_tail_channels, cfg.num_classes)
    elif name == "mac":
        dim = cfg.mac_dim
        embed("embed", cfg.vocab_size, cfg.embed_size)
        lstm("lstm", cfg.embed_size, dim, bidir=True)
        lin("lstm_proj", 2 * dim, dim)
        conv("conv.0", cfg.num_input_channels, dim)
        conv("conv.2", dim, dim)
        conv("conv.4", dim, dim)
        for i in range(cfg.mac_max_step):
            lin(f"mac.control.position_aware.{i}", 2 * dim, dim)
        lin("mac.control.control_question", 2 * dim, dim)
        lin("mac.control.attn", dim, 1)
        lin("mac.read.mem", dim, dim)
        lin("mac.read.concat", 2 * dim, dim)
        lin("mac.read.attn", dim, 1)
        lin("mac.write.concat", 2 * dim, dim)
        mods["mac.mem_0"] = torch.zeros(1, dim)
        mods["mac.control_0"] = torch.zeros(1, dim)
        lstm("lstm_tail", 3 * dim, 3 * dim)
        lin("classifier.0", 3 * dim, 2 * dim)
        lin("classifier.2", 2 * dim, cfg.num_classes)

    return {k: v.detach().numpy() for k, v in mods.items()}
