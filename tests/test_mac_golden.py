"""Golden logit-parity for MAC against a faithful torch fixture.

Reproduces MACNetwork's forward semantics (SURVEY §2.3; models/mac.py):
packed biLSTM question encoding with lstm_proj bias rows at padded words,
per-frame knowledge grids through the effective-batch loop, the 12-step
control/read/write recurrence (eval mode, no variational dropout), zero-padded
frame outputs, packed tail LSTM and last-valid gather.
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
    num_classes=7, vocab_size=19, embed_size=10, num_input_channels=12,
    mac_dim=8, mac_max_step=3, max_num_frames=5, max_q_len=9,
    compute_dtype="float32")


class _TorchMAC(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        dim = cfg.mac_dim
        self.cfg = cfg
        self.conv = nn.Sequential(
            nn.Conv2d(cfg.num_input_channels, dim, 3, padding=1), nn.ELU(),
            nn.Conv2d(dim, dim, 3, padding=1), nn.ELU(),
            nn.Conv2d(dim, dim, 3, padding=1), nn.ELU())
        self.embed = nn.Embedding(cfg.vocab_size, cfg.embed_size, padding_idx=0)
        self.lstm = nn.LSTM(cfg.embed_size, dim, batch_first=True, bidirectional=True)
        self.lstm_proj = nn.Linear(2 * dim, dim)
        # MAC units
        self.position_aware = nn.ModuleList(
            [nn.Linear(2 * dim, dim) for _ in range(cfg.mac_max_step)])
        self.control_question = nn.Linear(2 * dim, dim)
        self.control_attn = nn.Linear(dim, 1)
        self.read_mem = nn.Linear(dim, dim)
        self.read_concat = nn.Linear(2 * dim, dim)
        self.read_attn = nn.Linear(dim, 1)
        self.write_concat = nn.Linear(2 * dim, dim)
        self.mem_0 = nn.Parameter(torch.zeros(1, dim))
        self.control_0 = nn.Parameter(torch.zeros(1, dim))
        self.lstm_tail = nn.LSTM(3 * dim, 3 * dim)
        self.classifier = nn.Sequential(nn.Linear(3 * dim, 2 * dim), nn.ELU(),
                                        nn.Linear(2 * dim, cfg.num_classes))

    def state_dict_reference_names(self):
        """Rename fixture layers to the reference state_dict key layout."""
        sd = {}
        ren = {
            "conv.0.": "conv.0.", "conv.2.": "conv.2.", "conv.4.": "conv.4.",
            "embed.": "embed.", "lstm.": "lstm.", "lstm_proj.": "lstm_proj.",
            "control_question.": "mac.control.control_question.",
            "control_attn.": "mac.control.attn.",
            "read_mem.": "mac.read.mem.", "read_concat.": "mac.read.concat.",
            "read_attn.": "mac.read.attn.",
            "write_concat.": "mac.write.concat.",
            "mem_0": "mac.mem_0", "control_0": "mac.control_0",
            "lstm_tail.": "lstm_tail.",
            "classifier.0.": "classifier.0.", "classifier.2.": "classifier.2.",
        }
        for k, v in self.state_dict().items():
            if k.startswith("position_aware."):
                i, rest = k.split(".")[1], k.split(".", 2)[2]
                sd[f"mac.control.position_aware.{i}.{rest}"] = v
                continue
            for old, new in ren.items():
                if k.startswith(old):
                    sd[new + k[len(old):]] = v
                    break
        return sd

    def mac_step(self, step, context, question, know, control, memory):
        dim = self.cfg.mac_dim
        pa = self.position_aware[step](question)
        cq = self.control_question(torch.cat([control, pa], 1)).unsqueeze(1)
        attn = torch.softmax(self.control_attn(cq * context), 1)
        control = (attn * context).sum(1)

        mem = self.read_mem(memory).unsqueeze(2)
        concat = self.read_concat(torch.cat([mem * know, know], 1).permute(0, 2, 1))
        rattn = self.read_attn(concat * control.unsqueeze(1)).squeeze(2)
        rattn = torch.softmax(rattn, 1).unsqueeze(1)
        read = (rattn * know).sum(2)

        memory = self.write_concat(torch.cat([read, memory], 1))
        return control, memory

    def forward(self, images, question, v_lens, q_lens):
        dim = self.cfg.mac_dim
        b_size = images.size(0)
        B = b_size
        embed = self.embed(question[:b_size])
        slens, perm = q_lens.sort(0, descending=True)
        packed = nn.utils.rnn.pack_padded_sequence(embed[perm], slens, batch_first=True)
        lstm_out, (h, _) = self.lstm(packed)
        lstm_out, _ = nn.utils.rnn.pad_packed_sequence(lstm_out, batch_first=True)
        _, invperm = perm.sort(0)
        lstm_out = lstm_out[invperm]
        context = self.lstm_proj(lstm_out)
        h = h.permute(1, 0, 2)[invperm].contiguous().view(B, -1)

        outs = []
        for i in range(int(v_lens[0])):
            while b_size >= 0 and v_lens[b_size - 1] < i + 1:
                b_size -= 1
            if b_size == -1:
                break
            img = self.conv(images[:b_size, :, :, :, i]).view(b_size, dim, -1)
            control = self.control_0.expand(b_size, dim)
            memory = self.mem_0.expand(b_size, dim)
            for s in range(self.cfg.mac_max_step):
                control, memory = self.mac_step(
                    s, context[:b_size], h[:b_size], img, control, memory)
            out = torch.cat([memory, h[:b_size]], 1)
            out = torch.nn.functional.pad(out, (0, 0, 0, B - b_size))
            outs.append(out.view(B, 1, -1))

        outs = torch.cat(outs, dim=1)
        outs = torch.nn.functional.pad(
            outs, (0, 0, 0, self.cfg.max_num_frames - int(v_lens[0])))
        packed = nn.utils.rnn.pack_padded_sequence(outs, v_lens, batch_first=True)
        tail, _ = self.lstm_tail(packed)
        tail, _ = nn.utils.rnn.pad_packed_sequence(tail, batch_first=True)
        idx = v_lens.view(B, 1, 1).expand(B, 1, tail.size(-1)) - 1
        out = tail.gather(1, idx).view(B, -1)
        return self.classifier(out)


def test_mac_golden_parity():
    torch.manual_seed(2)
    m = _TorchMAC(CFG).eval()
    sd = {k: v.detach().numpy() for k, v in m.state_dict_reference_names().items()}
    params, state, missing = import_model_checkpoint("mac", sd, CFG)
    assert missing == []
    verify_shapes("mac", params, state, CFG)

    rng = np.random.RandomState(2)
    B, T = 3, CFG.max_num_frames
    v_lens = np.array([5, 3, 1])  # sorted desc (harness requirement)
    q_lens = np.array([4, 7, 2])  # batch max < MAX_Q_LEN exercises the word mask
    v = rng.randn(B, CFG.num_input_channels, 10, 13, T).astype(np.float32) * 0.5
    for b in range(B):
        v[b, :, :, :, v_lens[b]:] = 0.0
    q = rng.randint(1, CFG.vocab_size, size=(B, CFG.max_q_len))
    for b in range(B):
        q[b, q_lens[b]:] = 0

    with torch.no_grad():
        ref = m(torch.from_numpy(v), torch.from_numpy(q),
                torch.from_numpy(v_lens), torch.from_numpy(q_lens)).numpy()

    spec = get_model("mac")
    batch = {
        "v_features": jnp.asarray(v.transpose(0, 4, 2, 3, 1)),
        "question": jnp.asarray(q),
        "v_len": jnp.asarray(v_lens),
        "q_len": jnp.asarray(q_lens),
    }
    got, _ = spec.apply(params, state, batch, CFG, train=False,
                        rng=jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(got), ref, atol=3e-4)
