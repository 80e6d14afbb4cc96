"""Measure bfloat16-vs-float32 logit drift at the flagship eval.sh config.

The harness defaults to compute_dtype=bfloat16 (cli/common.py); this records
the drift bound that justifies it, at the production shapes
(eval.sh:36-40: film_attn_pt, 5 res blocks @ 1024 channels, batch 32).

Run on the real chip:  python scripts/bf16_parity.py
Writes the measured bound to stdout; PERF.md records the latest numbers.
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from videonavqa_tpu.models import ModelConfig, get_model
from videonavqa_tpu.stem import init_obj_detector, init_vgg_partial, stem_features


def main(model="film_attn_pt", batch=32):
    cfg32 = ModelConfig(model=model, num_res_blocks=5,
                        num_res_block_channels=1024, compute_dtype="float32")
    cfg16 = dataclasses.replace(cfg32, compute_dtype="bfloat16")
    spec = get_model(model)
    key = jax.random.PRNGKey(0)
    params, state = spec.init(key, cfg32)
    vgg = init_vgg_partial(key)
    detp, dets = init_obj_detector(key)

    kv, kq, kl = jax.random.split(key, 3)
    T = 35
    video = jax.random.uniform(kv, (batch, T, 160, 208, 3), jnp.float32)
    lens = np.clip(np.random.RandomState(0).randint(3, 36, size=batch), 3, T)
    batch_data = {
        "question": jax.random.randint(kq, (batch, 56), 1, cfg32.vocab_size),
        "v_len": jnp.asarray(lens, jnp.int32),
        "q_len": jnp.full((batch,), 12, jnp.int32),
    }

    @jax.jit
    def logits_f32(params, state, vgg, detp, dets, video, q, v_len, q_len):
        feats = stem_features(vgg, detp, dets, video, dtype=jnp.float32)
        b = {"v_features": feats, "question": q, "v_len": v_len, "q_len": q_len}
        out, _ = spec.apply(params, state, b, cfg32, train=False,
                            rng=jax.random.PRNGKey(1))
        return out

    @jax.jit
    def logits_bf16(params, state, vgg, detp, dets, video, q, v_len, q_len):
        feats = stem_features(vgg, detp, dets, video, dtype=jnp.bfloat16)
        b = {"v_features": feats, "question": q, "v_len": v_len, "q_len": q_len}
        out, _ = spec.apply(params, state, b, cfg16, train=False,
                            rng=jax.random.PRNGKey(1))
        return out

    args = (params, state, vgg, detp, dets, video,
            batch_data["question"], batch_data["v_len"], batch_data["q_len"])
    l32 = np.asarray(logits_f32(*args), dtype=np.float64)
    l16 = np.asarray(logits_bf16(*args), dtype=np.float64)

    abs_err = np.abs(l32 - l16)
    scale = np.abs(l32).max()
    p32 = jax.nn.softmax(jnp.asarray(l32), axis=-1)
    p16 = jax.nn.softmax(jnp.asarray(l16), axis=-1)
    argmax_agree = float(np.mean(np.argmax(l32, -1) == np.argmax(l16, -1)))
    tv = float(np.max(np.sum(np.abs(np.asarray(p32) - np.asarray(p16)), -1)) / 2)

    print(f"model={model} batch={batch} config=eval.sh flagship (5x1024)")
    print(f"logit scale (max |f32|):      {scale:.4f}")
    print(f"max abs logit drift:          {abs_err.max():.4f}")
    print(f"mean abs logit drift:         {abs_err.mean():.4f}")
    print(f"max relative drift:           {abs_err.max() / scale:.4%}")
    print(f"argmax agreement:             {argmax_agree:.4%}")
    print(f"max total-variation distance: {tv:.4f}")
    return abs_err.max() / scale, argmax_agree


if __name__ == "__main__":
    main(*sys.argv[1:2])
