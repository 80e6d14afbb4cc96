"""Golden logit-parity for the q_only models (bow, lstm) against faithful
torch fixtures with imported weights.

Reproduces QOnlyBOW (models/q_only_bow.py:6-48 — the 'mean' whose torch.div
result is discarded, i.e. a sum) and QOnlyLSTM (models/q_only_lstm.py:7-69 —
packed LSTM, last-valid gather, randn hidden init).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from videonavqa_tpu.models import ModelConfig, get_model
from videonavqa_tpu.utils.zoo_import import import_model_checkpoint, verify_shapes

torch = pytest.importorskip("torch")
nn = torch.nn

CFG = ModelConfig(model="bow", num_classes=7, vocab_size=19, embed_size=8,
                  hidden_size=6, max_q_len=9, compute_dtype="float32")


def _question_batch(rng, B, sorted_desc=False):
    q_lens = np.sort(rng.randint(1, CFG.max_q_len + 1, size=B))[::-1].copy() \
        if sorted_desc else rng.randint(1, CFG.max_q_len + 1, size=B)
    q = rng.randint(1, CFG.vocab_size, size=(B, CFG.max_q_len))
    for b in range(B):
        q[b, q_lens[b]:] = 0
    return q.astype(np.int64), q_lens.astype(np.int64)


class _TorchBOW(nn.Module):
    """QOnlyBOW minus the dead torch.div loop (its result is discarded,
    models/q_only_bow.py:45-48) and the cuda cast."""

    def __init__(self, cfg):
        super().__init__()
        self.embed = nn.Embedding(cfg.vocab_size, cfg.embed_size, padding_idx=0)
        self.out_linear = nn.Linear(cfg.embed_size, cfg.num_classes)

    def forward(self, q):
        return self.out_linear(torch.sum(self.embed(q), dim=1))


class _TorchQLSTM(nn.Module):
    """QOnlyLSTM on CPU with injectable hidden state (the reference draws
    randn h0/c0, models/q_only_lstm.py:50-54; we inject the same arrays the
    JAX model derives from its rng so both sides start identically)."""

    def __init__(self, cfg):
        super().__init__()
        self.embed = nn.Embedding(cfg.vocab_size, cfg.embed_size, padding_idx=0)
        self.lstm = nn.LSTM(cfg.embed_size, cfg.hidden_size)
        self.out_linear = nn.Linear(cfg.hidden_size, cfg.num_classes)

    def forward(self, q, q_lens, h0, c0):
        B = q.shape[0]
        H = self.lstm.hidden_size
        x = self.embed(q).permute(1, 0, 2)
        packed = nn.utils.rnn.pack_padded_sequence(x, q_lens.numpy())
        out, _ = self.lstm(packed, (h0, c0))
        out = nn.utils.rnn.pad_packed_sequence(out)[0].permute(1, 0, 2)
        idx = q_lens.view(B, 1, 1).expand(B, 1, H) - 1
        final = out.gather(1, idx).view(B, H)
        return self.out_linear(final)


def test_bow_golden():
    torch.manual_seed(0)
    m = _TorchBOW(CFG).eval()
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    params, state, missing = import_model_checkpoint("bow", sd, CFG)
    assert missing == []
    verify_shapes("bow", params, state, CFG)

    q, q_lens = _question_batch(np.random.RandomState(1), B=4)
    with torch.no_grad():
        ref = m(torch.from_numpy(q)).numpy()

    spec = get_model("bow")
    got, _ = spec.apply(params, state,
                        {"question": jnp.asarray(q), "q_len": jnp.asarray(q_lens)},
                        CFG, train=False, rng=jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5)


def test_lstm_golden():
    import dataclasses

    cfg = dataclasses.replace(CFG, model="lstm")
    torch.manual_seed(0)
    m = _TorchQLSTM(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    params, state, missing = import_model_checkpoint("lstm", sd, cfg)
    assert missing == []
    verify_shapes("lstm", params, state, cfg)

    # the reference harness feeds batches pre-sorted by descending q_len
    # (eval/q_only_eval.py:75-78; pack_padded_sequence requires it)
    B = 4
    q, q_lens = _question_batch(np.random.RandomState(2), B, sorted_desc=True)

    # identical randn h0/c0 on both sides: derive exactly as apply_fn does
    rng = jax.random.PRNGKey(3)
    k_h, k_c = jax.random.split(rng)
    h0 = np.asarray(jax.random.normal(k_h, (B, cfg.hidden_size)))
    c0 = np.asarray(jax.random.normal(k_c, (B, cfg.hidden_size)))

    with torch.no_grad():
        ref = m(torch.from_numpy(q), torch.from_numpy(q_lens),
                torch.from_numpy(h0)[None], torch.from_numpy(c0)[None]).numpy()

    spec = get_model("lstm")
    got, _ = spec.apply(params, state,
                        {"question": jnp.asarray(q), "q_len": jnp.asarray(q_lens)},
                        cfg, train=False, rng=rng)
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5)
