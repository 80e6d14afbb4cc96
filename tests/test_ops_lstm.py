"""Masked-LSTM scan vs torch packed-sequence golden parity.

The masked lax.scan must reproduce cuDNN packed-sequence semantics exactly
(zero-padded outputs, frozen final carry) — this is the core ragged-axis
replacement for the whole model zoo.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from videonavqa_tpu.ops import lstm as jl

torch = pytest.importorskip("torch")


def _torch_lstm_ref(w_ih, w_hh, b_ih, b_hh, x, lens, h0, c0):
    """Run torch nn.LSTM over a packed padded batch; return padded outs + (h, c)."""
    B, T, E = x.shape
    H = w_hh.shape[1]
    m = torch.nn.LSTM(E, H)
    with torch.no_grad():
        m.weight_ih_l0.copy_(torch.from_numpy(w_ih))
        m.weight_hh_l0.copy_(torch.from_numpy(w_hh))
        m.bias_ih_l0.copy_(torch.from_numpy(b_ih))
        m.bias_hh_l0.copy_(torch.from_numpy(b_hh))
    xt = torch.from_numpy(x).permute(1, 0, 2)  # [T,B,E]
    # torch packing requires descending lengths; sort and unsort like the reference
    lens_t = torch.from_numpy(lens)
    slens, perm = lens_t.sort(0, descending=True)
    xt = xt[:, perm]
    packed = torch.nn.utils.rnn.pack_padded_sequence(xt, slens.numpy())
    h0t = torch.from_numpy(h0)[None][:, perm]
    c0t = torch.from_numpy(c0)[None][:, perm]
    with torch.no_grad():
        out, (hn, cn) = m(packed, (h0t, c0t))
    out, _ = torch.nn.utils.rnn.pad_packed_sequence(out, total_length=T)
    _, invperm = perm.sort(0)
    out = out[:, invperm].permute(1, 0, 2)
    hn = hn[0][invperm]
    cn = cn[0][invperm]
    return out.numpy(), hn.numpy(), cn.numpy()


def test_masked_lstm_matches_torch_packed():
    rng = np.random.RandomState(0)
    B, T, E, H = 5, 9, 7, 6
    x = rng.randn(B, T, E).astype(np.float32)
    lens = np.array([9, 4, 1, 7, 4], dtype=np.int64)
    w_ih = rng.randn(4 * H, E).astype(np.float32) * 0.3
    w_hh = rng.randn(4 * H, H).astype(np.float32) * 0.3
    b_ih = rng.randn(4 * H).astype(np.float32) * 0.1
    b_hh = rng.randn(4 * H).astype(np.float32) * 0.1
    h0 = rng.randn(B, H).astype(np.float32) * 0.2
    c0 = rng.randn(B, H).astype(np.float32) * 0.2

    ref_out, ref_h, ref_c = _torch_lstm_ref(w_ih, w_hh, b_ih, b_hh, x, lens, h0, c0)

    params = {"w_ih": jnp.asarray(w_ih), "w_hh": jnp.asarray(w_hh),
              "b_ih": jnp.asarray(b_ih), "b_hh": jnp.asarray(b_hh)}
    out, (hn, cn) = jl.lstm(params, jnp.asarray(x), jnp.asarray(lens),
                            jnp.asarray(h0), jnp.asarray(c0))

    np.testing.assert_allclose(np.asarray(out), ref_out, atol=1e-5)
    np.testing.assert_allclose(np.asarray(hn), ref_h, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cn), ref_c, atol=1e-5)


def test_masked_lstm_padding_invariance():
    """Changing input values beyond each row's length must not change anything."""
    rng = np.random.RandomState(1)
    B, T, E, H = 3, 8, 4, 5
    x = rng.randn(B, T, E).astype(np.float32)
    lens = np.array([3, 8, 5])
    params = {"w_ih": jnp.asarray(rng.randn(4 * H, E).astype(np.float32)),
              "w_hh": jnp.asarray(rng.randn(4 * H, H).astype(np.float32)),
              "b_ih": jnp.zeros(4 * H), "b_hh": jnp.zeros(4 * H)}
    out1, (h1, c1) = jl.lstm(params, jnp.asarray(x), jnp.asarray(lens))
    x2 = x.copy()
    for b in range(B):
        x2[b, lens[b]:] = 99.0
    out2, (h2, c2) = jl.lstm(params, jnp.asarray(x2), jnp.asarray(lens))
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))
    # outputs beyond length are exactly zero
    for b in range(B):
        assert np.all(np.asarray(out1)[b, lens[b]:] == 0)


def test_bilstm_matches_torch():
    rng = np.random.RandomState(2)
    B, T, E, H = 4, 6, 5, 3
    x = rng.randn(B, T, E).astype(np.float32)
    lens = np.array([6, 2, 4, 5], dtype=np.int64)

    m = torch.nn.LSTM(E, H, bidirectional=True)
    sd = {k: v.detach().numpy().copy() for k, v in m.state_dict().items()}

    xt = torch.from_numpy(x).permute(1, 0, 2)
    lens_t = torch.from_numpy(lens)
    slens, perm = lens_t.sort(0, descending=True)
    packed = torch.nn.utils.rnn.pack_padded_sequence(xt[:, perm], slens.numpy())
    with torch.no_grad():
        out, (hn, _) = m(packed)
    out, _ = torch.nn.utils.rnn.pad_packed_sequence(out, total_length=T)
    _, invperm = perm.sort(0)
    ref_out = out[:, invperm].permute(1, 0, 2).numpy()
    # torch h_n: [2, B, H] (fwd, bwd)
    ref_h = torch.cat([hn[0][invperm], hn[1][invperm]], dim=1).numpy()

    fwd = {"w_ih": jnp.asarray(sd["weight_ih_l0"]), "w_hh": jnp.asarray(sd["weight_hh_l0"]),
           "b_ih": jnp.asarray(sd["bias_ih_l0"]), "b_hh": jnp.asarray(sd["bias_hh_l0"])}
    bwd = {"w_ih": jnp.asarray(sd["weight_ih_l0_reverse"]), "w_hh": jnp.asarray(sd["weight_hh_l0_reverse"]),
           "b_ih": jnp.asarray(sd["bias_ih_l0_reverse"]), "b_hh": jnp.asarray(sd["bias_hh_l0_reverse"])}
    out_j, h_j = jl.bilstm(fwd, bwd, jnp.asarray(x), jnp.asarray(lens))
    np.testing.assert_allclose(np.asarray(out_j), ref_out, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_j), ref_h, atol=1e-5)


def test_last_valid_gather():
    y = jnp.arange(2 * 4 * 3, dtype=jnp.float32).reshape(2, 4, 3)
    lens = jnp.array([2, 4])
    got = jl.last_valid(y, lens)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(y)[[0, 1], [1, 3]])
