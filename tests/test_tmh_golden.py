"""Golden logit-parity for time_multi_hop against a faithful torch fixture.

Reproduces TimeMultiHopFiLMPretrainedStem's semantics (SURVEY §2.3;
models/time_multi_hop_pt_stem.py): per frame the question is re-encoded with
the carried encoder LSTM state, the context vector resets to the LayerNormed
final state, and each res-block decodes fresh FiLM values by attending over
h (*) rnn_states (softmax over the batch-max word window), advancing h.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from videonavqa_tpu.models import ModelConfig, get_model
from videonavqa_tpu.utils.zoo_import import import_model_checkpoint, verify_shapes

torch = pytest.importorskip("torch")
nn = torch.nn

CFG = ModelConfig(
    num_classes=7, vocab_size=19, embed_size=8, hidden_size=8,
    num_res_blocks=2, num_res_block_channels=16, num_input_channels=12,
    num_tail_channels=4, max_num_frames=5, max_q_len=9, compute_dtype="float32")


class _TorchTMH(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        C = cfg.num_res_block_channels
        H = cfg.hidden_size
        total = 2 * C * cfg.num_res_blocks
        self.cfg = cfg
        self.embed = nn.Embedding(cfg.vocab_size, cfg.embed_size, padding_idx=0)
        self.conv_init = nn.Conv2d(cfg.num_input_channels, C, 3, padding=1)
        self.bn_init = nn.BatchNorm2d(C)
        self.q_encoder = nn.LSTM(cfg.embed_size, H)
        self.encoder_norm = nn.LayerNorm(H)
        self.fc_hidden_attn = nn.Linear(H, 1)
        self.fc_attn_out = nn.Linear(H, total)
        self.decoder_norm = nn.LayerNorm(total)
        self.film_pipeline = nn.ModuleList(
            [nn.Conv2d(C, C, 3, padding=1) for _ in range(cfg.num_res_blocks)])
        self.conv1x1_layers = nn.ModuleList(
            [nn.Conv2d(C, C, 1) for _ in range(cfg.num_res_blocks)])
        self.c1x1_tail = nn.Conv2d(C, cfg.num_tail_channels, 1)
        self.out_linear = nn.Linear(130 * cfg.num_tail_channels, cfg.num_classes)

    def encode(self, q, q_lens, hidden, ct):
        B = q.shape[0]
        H = self.cfg.hidden_size
        emb = self.embed(q)
        slens, perm = q_lens.sort(0, descending=True)
        x = emb[perm].permute(1, 0, 2)
        packed = nn.utils.rnn.pack_padded_sequence(x, slens.numpy())
        out, hidden = self.q_encoder(packed, hidden)
        out, _ = nn.utils.rnn.pad_packed_sequence(out)
        _, invperm = perm.sort(0)
        out = out.permute(1, 0, 2)[invperm]  # [B, max_q, H]
        idx = q_lens.view(B, 1, 1).expand(B, 1, H) - 1
        final = out.gather(1, idx).view(B, H)[:ct]
        encoded = self.encoder_norm(final)
        return encoded, out, hidden

    def decode(self, h, rnn_states, ct):
        # h: [ct, Tq, H]; rnn_states: [ct, Tq, H]
        p = h * rnn_states
        coefs = torch.softmax(self.fc_hidden_attn(p), dim=1)  # [ct, Tq, 1]
        hv = torch.bmm(coefs.permute(0, 2, 1), p).view(ct, -1)  # [ct, H]
        values = self.decoder_norm(self.fc_attn_out(hv))
        return values, hv

    def forward(self, v, q, v_lens, q_lens):
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
            encoded, rnn_states, hidden = self.encode(q, q_lens, hidden, ct)
            num_words = rnn_states.shape[1]
            h = encoded.view(ct, 1, -1).repeat(1, num_words, 1)
            start = 0
            for k, conv3 in enumerate(self.film_pipeline):
                res = torch.relu(self.conv1x1_layers[k](x))
                y = conv3(res)
                film, hv = self.decode(h, rnn_states[:ct], ct)
                h = hv.view(ct, 1, -1).repeat(1, num_words, 1)
                a = film[:, start:start + C].view(ct, C, 1, 1)
                b = film[:, start + C:start + 2 * C].view(ct, C, 1, 1)
                start += 2 * C
                x = torch.relu(a * y + b) + res
            x = torch.relu(self.c1x1_tail(x))
            x = torch.nn.functional.pad(x.reshape(1, ct, -1), (0, 0, 0, B - ct))
            feats.append(x)
        pooled = torch.max(torch.cat(feats, dim=0), dim=0)[0]
        return self.out_linear(pooled)


def test_tmh_golden_parity():
    torch.manual_seed(3)
    m = _TorchTMH(CFG).eval()
    with torch.no_grad():
        m.bn_init.running_mean.uniform_(-0.2, 0.2)
        m.bn_init.running_var.uniform_(0.9, 1.2)

    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()
          if not k.startswith("conv1x1_layers")}
    params, state, missing = import_model_checkpoint("time_multi_hop", sd, CFG)
    assert missing == ["trunk/conv1x1_0", "trunk/conv1x1_1"]
    verify_shapes("time_multi_hop", params, state, CFG)
    for k in range(CFG.num_res_blocks):
        w = m.conv1x1_layers[k].weight.detach().numpy().transpose(2, 3, 1, 0)
        params["trunk"][f"conv1x1_{k}"] = {
            "weight": jnp.asarray(w),
            "bias": jnp.asarray(m.conv1x1_layers[k].bias.detach().numpy())}

    rng = np.random.RandomState(3)
    B, T = 3, CFG.max_num_frames
    v_lens = np.array([5, 3, 1])
    q_lens = np.array([4, 7, 2])  # batch max < MAX_Q_LEN exercises the word window
    v = rng.randn(B, CFG.num_input_channels, 10, 13, T).astype(np.float32) * 0.5
    for b in range(B):
        v[b, :, :, :, v_lens[b]:] = 0.0
    q = rng.randint(1, CFG.vocab_size, size=(B, CFG.max_q_len))
    for b in range(B):
        q[b, q_lens[b]:] = 0

    with torch.no_grad():
        ref = m(torch.from_numpy(v), torch.from_numpy(q),
                torch.from_numpy(v_lens), torch.from_numpy(q_lens)).numpy()

    spec = get_model("time_multi_hop")
    batch = {
        "v_features": jnp.asarray(v.transpose(0, 4, 2, 3, 1)),
        "question": jnp.asarray(q),
        "v_len": jnp.asarray(v_lens),
        "q_len": jnp.asarray(q_lens),
    }
    got, _ = spec.apply(params, state, batch, CFG, train=False,
                        rng=jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(got), ref, atol=3e-4)
