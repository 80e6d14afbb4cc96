"""Golden logit-parity for concat2d and concat3d against torch fixtures.

These cover the remaining trunk machinery: the per-frame VGG-11-style trunk
with its effective-batch loop and zero-filled feature container
(models/q_concat_cnn2d_lstm.py:88-110), the C3D volume geometry
(models/q_concat_cnn3d.py:89-106 — (H, W, T) treated as the conv3d volume),
and both models' dual-stream concat -> FC -> ReLU -> Linear tails.
Eval mode (BN running stats, dropout off).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from videonavqa_tpu.models import ModelConfig, get_model
from videonavqa_tpu.utils.zoo_import import import_model_checkpoint, verify_shapes

torch = pytest.importorskip("torch")
nn = torch.nn

CFG = ModelConfig(num_classes=7, vocab_size=19, embed_size=8, hidden_size=128,
                  max_num_frames=35, max_q_len=9, compute_dtype="float32")


def _rand_bn_stats(m):
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, (nn.BatchNorm1d, nn.BatchNorm2d, nn.BatchNorm3d)):
                mod.running_mean.uniform_(-0.2, 0.2)
                mod.running_var.uniform_(0.9, 1.2)


def _question_stream(embed, q_lstm, q, q_lens, B):
    emb = embed(q)
    slens, perm = q_lens.sort(0, descending=True)
    packed = nn.utils.rnn.pack_padded_sequence(
        emb[perm].permute(1, 0, 2), slens.numpy())
    out, _ = q_lstm(packed)
    out, _ = nn.utils.rnn.pad_packed_sequence(out)
    _, invperm = perm.sort(0)
    out = out.permute(1, 0, 2)[invperm]
    idx = q_lens.view(B, 1, 1).expand(B, 1, 128) - 1
    return out.gather(1, idx).view(B, 128)


class _TorchConcat2D(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        chans = [3, 16, 32, 64, 128, 128]
        layers = []
        for cin, cout in zip(chans[:-1], chans[1:]):
            layers += [nn.Conv2d(cin, cout, 3, padding=1), nn.BatchNorm2d(cout),
                       nn.ReLU(inplace=True), nn.MaxPool2d(2)]
        self.trunk = nn.Sequential(*layers)
        self.v_lstm = nn.LSTM(128 * 5 * 6, 128)
        self.embed = nn.Embedding(cfg.vocab_size, cfg.embed_size)
        self.q_lstm = nn.LSTM(cfg.embed_size, 128)
        self.fc_tail = nn.Linear(256, 256)
        self.out_linear = nn.Linear(256, cfg.num_classes)

    def reference_sd(self):
        sd = {}
        for k, v in self.state_dict().items():
            if k.startswith("trunk."):
                sd["per_frame_feature_extractor." + k[len("trunk."):]] = v
            else:
                sd[k] = v
        return sd

    def forward(self, v, q, v_lens, q_lens):
        B, T = v.shape[0], v.shape[-1]
        feats = torch.zeros(T, B, 128 * 5 * 6)
        ct = B
        for i in range(T):
            while v_lens[ct - 1] < i + 1 and ct >= 0:
                ct -= 1
            if ct == -1:
                break
            f = self.trunk(v[:ct, :, :, :, i])
            feats[i, :ct] = f.reshape(ct, -1)
        packed = nn.utils.rnn.pack_padded_sequence(feats, v_lens.numpy())
        out, _ = self.v_lstm(packed)
        out, _ = nn.utils.rnn.pad_packed_sequence(out, total_length=T)
        out = out.permute(1, 0, 2)
        idx = v_lens.view(B, 1, 1).expand(B, 1, 128) - 1
        v_final = out.gather(1, idx).view(B, 128)

        q_final = _question_stream(self.embed, self.q_lstm, q, q_lens, B)
        h = torch.relu(self.fc_tail(torch.cat([v_final, q_final], 1)))
        return self.out_linear(h)


class _TorchConcat3D(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.bn_input = nn.BatchNorm3d(3)
        self.conv1 = nn.Conv3d(3, 64, 3, padding=1)
        self.bn1 = nn.BatchNorm3d(64)
        self.conv2 = nn.Conv3d(64, 128, 3, padding=1)
        self.bn2 = nn.BatchNorm3d(128)
        self.conv3a = nn.Conv3d(128, 128, 3, padding=1)
        self.bn3 = nn.BatchNorm3d(128)
        self.fc6 = nn.Linear(7680, 2048)
        self.bn6 = nn.BatchNorm1d(2048)
        self.fc7 = nn.Linear(2048, 128)
        self.bn7 = nn.BatchNorm1d(128)
        self.embed = nn.Embedding(cfg.vocab_size, cfg.embed_size)
        self.q_lstm = nn.LSTM(cfg.embed_size, 128)
        self.fc_tail = nn.Linear(256, 256)
        self.out_linear = nn.Linear(256, cfg.num_classes)

    def forward(self, v, q, v_lens, q_lens):
        B = v.shape[0]
        h = self.bn_input(v)
        h = torch.max_pool3d(torch.relu(self.conv1(h)), (1, 2, 2))
        h = self.bn1(h)
        h = torch.max_pool3d(torch.relu(self.conv2(h)), (4, 4, 4))
        h = self.bn2(h)
        h = torch.max_pool3d(torch.relu(self.conv3a(h)), (4, 4, 4))
        h = self.bn3(h)
        h = h.reshape(B, -1)
        h = self.bn6(torch.relu(self.fc6(h)))
        h = self.bn7(torch.relu(self.fc7(h)))
        q_final = _question_stream(self.embed, self.q_lstm, q, q_lens, B)
        out = torch.relu(self.fc_tail(torch.cat([h, q_final], 1)))
        return self.out_linear(out)


def _make_batch(rng, B, T):
    v_lens = np.array([T, max(T // 2, 1), 1][:B])
    q_lens = np.array([5, 9, 2][:B])
    v = rng.randn(B, 3, 160, 208, T).astype(np.float32) * 0.3
    for b in range(B):
        v[b, :, :, :, v_lens[b]:] = 0.0
    q = rng.randint(1, CFG.vocab_size, size=(B, CFG.max_q_len))
    for b in range(B):
        q[b, q_lens[b]:] = 0
    return v, q, v_lens, q_lens


def test_concat2d_golden_parity():
    torch.manual_seed(4)
    m = _TorchConcat2D(CFG).eval()
    _rand_bn_stats(m)
    params, state, missing = import_model_checkpoint("concat2d", m.reference_sd(), CFG)
    assert missing == []
    verify_shapes("concat2d", params, state, CFG)

    rng = np.random.RandomState(4)
    v, q, v_lens, q_lens = _make_batch(rng, B=3, T=6)
    with torch.no_grad():
        ref = m(torch.from_numpy(v), torch.from_numpy(q),
                torch.from_numpy(v_lens), torch.from_numpy(q_lens)).numpy()

    spec = get_model("concat2d")
    batch = {"video": jnp.asarray(v.transpose(0, 4, 2, 3, 1)),
             "question": jnp.asarray(q), "v_len": jnp.asarray(v_lens),
             "q_len": jnp.asarray(q_lens)}
    got, _ = spec.apply(params, state, batch, CFG, train=False,
                        rng=jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(got), ref, atol=3e-4)


def test_v_only_cnn3d_golden_parity():
    """Same C3D trunk as concat3d but with the fc8 classifier head
    (models/v_only_cnn3d.py:30-81); v_lens ignored by design."""
    torch.manual_seed(7)
    m = _TorchConcat3D(CFG).eval()
    _rand_bn_stats(m)
    fc8 = nn.Linear(128, CFG.num_classes)
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()
          if not any(k.startswith(p) for p in ("embed", "q_lstm", "fc_tail", "out_linear"))}
    sd.update({f"fc8.{k}": v.detach().numpy() for k, v in fc8.state_dict().items()})

    from videonavqa_tpu.utils.zoo_import import import_model_checkpoint

    params, state, missing = import_model_checkpoint("v_only_cnn3d", sd, CFG)
    assert missing == []
    verify_shapes("v_only_cnn3d", params, state, CFG)

    rng = np.random.RandomState(7)
    v, q, v_lens, q_lens = _make_batch(rng, B=2, T=35)
    with torch.no_grad():
        h = m.bn_input(torch.from_numpy(v))
        h = torch.max_pool3d(torch.relu(m.conv1(h)), (1, 2, 2))
        h = m.bn1(h)
        h = torch.max_pool3d(torch.relu(m.conv2(h)), (4, 4, 4))
        h = m.bn2(h)
        h = torch.max_pool3d(torch.relu(m.conv3a(h)), (4, 4, 4))
        h = m.bn3(h).reshape(2, -1)
        h = m.bn6(torch.relu(m.fc6(h)))
        h = m.bn7(torch.relu(m.fc7(h)))
        ref = fc8(h).numpy()

    spec = get_model("v_only_cnn3d")
    batch = {"video": jnp.asarray(v.transpose(0, 4, 2, 3, 1)),
             "v_len": jnp.asarray(v_lens)}
    got, _ = spec.apply(params, state, batch, CFG, train=False,
                        rng=jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(got), ref, atol=5e-4)


def test_concat3d_golden_parity():
    torch.manual_seed(5)
    m = _TorchConcat3D(CFG).eval()
    _rand_bn_stats(m)
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    params, state, missing = import_model_checkpoint("concat3d", sd, CFG)
    assert missing == []
    verify_shapes("concat3d", params, state, CFG)

    rng = np.random.RandomState(5)
    v, q, v_lens, q_lens = _make_batch(rng, B=2, T=35)
    with torch.no_grad():
        ref = m(torch.from_numpy(v), torch.from_numpy(q),
                torch.from_numpy(v_lens), torch.from_numpy(q_lens)).numpy()

    spec = get_model("concat3d")
    batch = {"video": jnp.asarray(v.transpose(0, 4, 2, 3, 1)),
             "question": jnp.asarray(q), "v_len": jnp.asarray(v_lens),
             "q_len": jnp.asarray(q_lens)}
    got, _ = spec.apply(params, state, batch, CFG, train=False,
                        rng=jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(got), ref, atol=5e-4)
