"""Golden logit-parity for v_only_cnn2d_lstm against a torch fixture.

Covers the one piece concat2d's golden doesn't: the input BatchNorm3d applied
to the whole zero-padded clip before the per-frame trunk
(models/v_only_cnn2d_lstm.py:73)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from videonavqa_tpu.models import ModelConfig, get_model
from videonavqa_tpu.utils.zoo_import import import_model_checkpoint, verify_shapes

torch = pytest.importorskip("torch")
nn = torch.nn

CFG = ModelConfig(num_classes=7, vocab_size=19, hidden_size=128,
                  max_num_frames=35, max_q_len=9, compute_dtype="float32")


class _TorchVOnly2D(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.input_bn = nn.BatchNorm3d(3)
        chans = [3, 16, 32, 64, 128, 128]
        layers = []
        for cin, cout in zip(chans[:-1], chans[1:]):
            layers += [nn.Conv2d(cin, cout, 3, padding=1), nn.BatchNorm2d(cout),
                       nn.ReLU(inplace=True), nn.MaxPool2d(2)]
        self.trunk = nn.Sequential(*layers)
        self.lstm = nn.LSTM(128 * 5 * 6, cfg.hidden_size)
        self.out_linear = nn.Linear(cfg.hidden_size, cfg.num_classes)

    def reference_sd(self):
        sd = {}
        for k, v in self.state_dict().items():
            if k.startswith("trunk."):
                sd["per_frame_feature_extractor." + k[len("trunk."):]] = v
            else:
                sd[k] = v
        return sd

    def forward(self, v, v_lens):
        B, T = v.shape[0], v.shape[-1]
        H = self.lstm.hidden_size
        v = self.input_bn(v)
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
        out, _ = self.lstm(packed)
        out, _ = nn.utils.rnn.pad_packed_sequence(out, total_length=T)
        out = out.permute(1, 0, 2)
        idx = v_lens.view(B, 1, 1).expand(B, 1, H) - 1
        final = out.gather(1, idx).view(B, H)
        return self.out_linear(final)


def test_v_only_cnn2d_lstm_golden_parity():
    torch.manual_seed(6)
    m = _TorchVOnly2D(CFG).eval()
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, (nn.BatchNorm2d, nn.BatchNorm3d)):
                mod.running_mean.uniform_(-0.2, 0.2)
                mod.running_var.uniform_(0.9, 1.2)
    params, state, missing = import_model_checkpoint(
        "v_only_cnn2d_lstm", m.reference_sd(), CFG)
    assert missing == []
    verify_shapes("v_only_cnn2d_lstm", params, state, CFG)

    rng = np.random.RandomState(6)
    B, T = 3, 5
    v_lens = np.array([5, 3, 1])
    v = rng.randn(B, 3, 160, 208, T).astype(np.float32) * 0.3
    for b in range(B):
        v[b, :, :, :, v_lens[b]:] = 0.0

    with torch.no_grad():
        ref = m(torch.from_numpy(v), torch.from_numpy(v_lens)).numpy()

    spec = get_model("v_only_cnn2d_lstm")
    batch = {"video": jnp.asarray(v.transpose(0, 4, 2, 3, 1)),
             "v_len": jnp.asarray(v_lens)}
    got, _ = spec.apply(params, state, batch, CFG, train=False,
                        rng=jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(got), ref, atol=3e-4)
