"""Golden logit-parity for film_attn_pt against a faithful torch fixture.

The fixture reproduces the reference's FiLMAttnPretrainedStem forward
semantics per SURVEY §2.3/§3.2: per-frame effective-batch loop with carried
film_hidden, sliced gamma/beta residual blocks, per-frame feature embedding
zero-padded to the batch, -2^31 masks only within the batch-max frame range,
precomputed per-frame scores with no bias at invalid slots, and the 35-step
attention-LSTMCell tail over zero-feature frames beyond the batch max.
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
    num_classes=7, vocab_size=19, embed_size=8, hidden_size=8, at_hidden_size=8,
    num_res_blocks=2, num_res_block_channels=16, num_input_channels=12,
    num_tail_channels=4, max_num_frames=6, max_q_len=9, compute_dtype="float32")

NEG = -float(1 << 31)


class _TorchFilmAttn(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        C = cfg.num_res_block_channels
        self.cfg = cfg
        self.embed = nn.Embedding(cfg.vocab_size, cfg.embed_size)  # no padding_idx
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
        A = cfg.at_hidden_size
        self.fc_embed_attn = nn.Linear(130 * C, A)
        self.fc_attn_1 = nn.Linear(A, 1)
        self.fc_hidden_attn = nn.Linear(A, 1)
        self.lstm_attn = nn.LSTMCell(A, A)
        self.out_linear = nn.Linear(cfg.max_num_frames * A, cfg.num_classes)

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
        B, T = v.shape[0], v.shape[-1]
        C = self.cfg.num_res_block_channels
        A = self.cfg.at_hidden_size
        hidden = (torch.zeros(1, B, self.cfg.hidden_size),
                  torch.zeros(1, B, self.cfg.hidden_size))
        actual_num_frames = int(v_lens[0])
        masks = torch.zeros(B, T, 1)
        all_features = []
        ct_sizes = np.zeros(T, dtype=np.int64)
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
            x = self.fc_embed_attn(x.reshape(ct, -1))
            x = torch.nn.functional.pad(x.view(1, ct, -1), (0, 0, 0, B - ct))
            all_features.append(x)
            ct_sizes[i] = ct
            masks[ct:, i, 0] = NEG

        all_features = torch.cat(all_features, dim=0).permute(1, 0, 2)
        all_features = torch.nn.functional.pad(
            all_features, (0, 0, 0, T - all_features.shape[1]))

        # precomputed scores: fc_attn_1 on valid entries only, zeros elsewhere
        feats_list = [all_features[:ct_sizes[i], i, :] for i in range(actual_num_frames)]
        flat = self.fc_attn_1(torch.cat(feats_list, dim=0))
        features = torch.zeros(B, T, 1)
        off = 0
        for i in range(actual_num_frames):
            features[:ct_sizes[i], i] = flat[off: off + ct_sizes[i]]
            off += ct_sizes[i]

        h = torch.zeros(B, 1, A)
        hs = torch.zeros(B, T, A)
        cell = torch.zeros(B, A)
        for i in range(T):
            v_i = self.fc_hidden_attn(h).repeat(1, T, 1)
            coefs = torch.softmax(v_i + features + masks, dim=1)
            ctxt = torch.bmm(coefs.permute(0, 2, 1), all_features).view(B, -1)
            hcat, cell = self.lstm_attn(ctxt, (h.view(B, -1), cell))
            hs[:, i, :] = hcat
            h = hcat.view(B, 1, A)
        return self.out_linear(hs.reshape(B, -1))


def test_film_attn_golden_parity():
    torch.manual_seed(1)
    m = _TorchFilmAttn(CFG).eval()
    with torch.no_grad():
        m.bn_init.running_mean.uniform_(-0.2, 0.2)
        m.bn_init.running_var.uniform_(0.9, 1.2)

    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()
          if not k.startswith("conv1x1_layers")}
    params, state, missing = import_model_checkpoint("film_attn_pt", sd, CFG)
    assert missing == ["trunk/conv1x1_0", "trunk/conv1x1_1"]
    verify_shapes("film_attn_pt", params, state, CFG)
    for k in range(CFG.num_res_blocks):
        w = m.conv1x1_layers[k].weight.detach().numpy().transpose(2, 3, 1, 0)
        params["trunk"][f"conv1x1_{k}"] = {
            "weight": jnp.asarray(w),
            "bias": jnp.asarray(m.conv1x1_layers[k].bias.detach().numpy())}

    rng = np.random.RandomState(1)
    B, T = 3, CFG.max_num_frames
    v_lens = np.array([4, 3, 1])  # batch max < T exercises the unmasked-frames quirk
    q_lens = np.array([5, 9, 2])
    v = rng.randn(B, CFG.num_input_channels, 10, 13, T).astype(np.float32) * 0.5
    for b in range(B):
        v[b, :, :, :, v_lens[b]:] = 0.0
    q = rng.randint(1, CFG.vocab_size, size=(B, CFG.max_q_len))
    for b in range(B):
        q[b, q_lens[b]:] = 0

    with torch.no_grad():
        ref = m(torch.from_numpy(v), torch.from_numpy(q),
                torch.from_numpy(v_lens), torch.from_numpy(q_lens)).numpy()

    spec = get_model("film_attn_pt")
    batch = {
        "v_features": jnp.asarray(v.transpose(0, 4, 2, 3, 1)),
        "question": jnp.asarray(q),
        "v_len": jnp.asarray(v_lens),
        "q_len": jnp.asarray(q_lens),
    }
    got, _ = spec.apply(params, state, batch, CFG, train=False,
                        rng=jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(got), ref, atol=3e-4)


def test_film_attn_train_step_golden_parity():
    """Flagship TRAIN-STEP parity vs torch: identical imported weights,
    identical batches, 3 full steps of CE-sum loss + global-norm clip(1.0) +
    Adam(1e-3) — the harness recipe (reference anchor: the optimizer/loss
    wiring at eval/q_and_v_eval.py:136-139) — must produce the same updated
    parameters. Closes the gap between the forward goldens and training
    dynamics (BoW Adam golden covers the optimizer; this covers the whole
    flagship backward: per-frame masked BN train stats, packed-LSTM film
    scan, FiLM residual blocks, attention tail)."""
    from videonavqa_tpu.train.step import make_optimizer, make_train_step

    torch.manual_seed(2)
    m = _TorchFilmAttn(CFG)
    m.train()

    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()
          if not k.startswith("conv1x1_layers")}
    params, state, missing = import_model_checkpoint("film_attn_pt", sd, CFG)
    assert missing == ["trunk/conv1x1_0", "trunk/conv1x1_1"]
    for k in range(CFG.num_res_blocks):
        w = m.conv1x1_layers[k].weight.detach().numpy().transpose(2, 3, 1, 0)
        params["trunk"][f"conv1x1_{k}"] = {
            "weight": jnp.asarray(w),
            "bias": jnp.asarray(m.conv1x1_layers[k].bias.detach().numpy())}

    spec = get_model("film_attn_pt")
    optimizer = make_optimizer(1e-3)
    opt_state = optimizer.init(params)
    step = make_train_step(spec, CFG, optimizer, reduction="sum",
                           clip_value=1.0, donate=False)
    opt_t = torch.optim.Adam(m.parameters(), lr=1e-3)

    rng = np.random.RandomState(7)
    B, T = 3, CFG.max_num_frames
    for it in range(3):
        v_lens = np.sort(rng.randint(1, T + 1, size=B))[::-1].copy()
        q_lens = rng.randint(1, CFG.max_q_len + 1, size=B)
        v = rng.randn(B, CFG.num_input_channels, 10, 13, T).astype(np.float32) * 0.5
        for b in range(B):
            v[b, :, :, :, v_lens[b]:] = 0.0
        q = rng.randint(1, CFG.vocab_size, size=(B, CFG.max_q_len))
        for b in range(B):
            q[b, q_lens[b]:] = 0
        y = rng.randint(0, CFG.num_classes, size=B)

        batch = {
            "v_features": jnp.asarray(v.transpose(0, 4, 2, 3, 1)),
            "question": jnp.asarray(q),
            "v_len": jnp.asarray(v_lens),
            "q_len": jnp.asarray(q_lens),
            "label": jnp.asarray(y),
        }
        params, state, opt_state, metrics = step(
            params, state, opt_state, batch, jax.random.PRNGKey(it))

        opt_t.zero_grad()
        logits = m(torch.from_numpy(v), torch.from_numpy(q),
                   torch.from_numpy(v_lens), torch.from_numpy(q_lens))
        loss = torch.nn.functional.cross_entropy(
            logits, torch.from_numpy(y), reduction="sum")
        np.testing.assert_allclose(float(metrics["loss"]), float(loss),
                                   rtol=1e-4)
        loss.backward()
        torch.nn.utils.clip_grad_norm_(m.parameters(), 1.0)
        opt_t.step()

    # updated torch weights -> params layout via the tested importer
    sd2 = {k: v.detach().numpy() for k, v in m.state_dict().items()
           if not k.startswith("conv1x1_layers")}
    want, want_state, _ = import_model_checkpoint("film_attn_pt", sd2, CFG)
    for k in range(CFG.num_res_blocks):
        w = m.conv1x1_layers[k].weight.detach().numpy().transpose(2, 3, 1, 0)
        want["trunk"][f"conv1x1_{k}"] = {
            "weight": jnp.asarray(w),
            "bias": jnp.asarray(m.conv1x1_layers[k].bias.detach().numpy())}

    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(want))
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=5e-4), params, want)
    # BN running stats accumulated through train-mode steps must match too
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=5e-4), state, want_state)
