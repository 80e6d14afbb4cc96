"""Measure the logit drift of float8_e4m3 feature-cache STORAGE at the
flagship eval.sh config (film_attn_pt, 5 res blocks @ 1024 ch, batch 32).

The fp8 cache (cli/extract_features.py --feature_dtype float8_e4m3) halves
disk and host->device bandwidth vs bf16 by rounding each frozen-stem feature
once to e4m3 (~3% per-element). This probe bounds what that single rounding
does to the logits: same bf16-computed features, one path round-tripped
through fp8, identical bf16 trunk on both.

Run on the real chip:  python scripts/fp8_cache_parity.py
PERF.md records the latest numbers.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from videonavqa_tpu.models import ModelConfig, get_model
from videonavqa_tpu.stem import init_obj_detector, init_vgg_partial, stem_features


def main(model="film_attn_pt", batch=32):
    cfg = ModelConfig(model=model, num_res_blocks=5,
                      num_res_block_channels=1024, compute_dtype="bfloat16")
    spec = get_model(model)
    key = jax.random.PRNGKey(0)
    params, state = spec.init(key, cfg)
    vgg = init_vgg_partial(key)
    detp, dets = init_obj_detector(key)

    kv, kq = jax.random.split(key)
    T = 35
    video = jax.random.uniform(kv, (batch, T, 160, 208, 3), jnp.float32)
    lens = np.clip(np.random.RandomState(0).randint(3, 36, size=batch), 3, T)
    q = jax.random.randint(kq, (batch, 56), 1, cfg.vocab_size)
    v_len = jnp.asarray(lens, jnp.int32)
    q_len = jnp.full((batch,), 12, jnp.int32)

    import ml_dtypes

    @jax.jit
    def stem(vgg, detp, dets, video):
        return stem_features(vgg, detp, dets, video, dtype=jnp.bfloat16)

    @jax.jit
    def logits(params, state, f, q, v_len, q_len):
        # widen on device exactly as train/step._forward does for fp8 caches
        b = {"v_features": f.astype(jnp.bfloat16), "question": q,
             "v_len": v_len, "q_len": q_len}
        out, _ = spec.apply(params, state, b, cfg, train=False,
                            rng=jax.random.PRNGKey(1))
        return out

    # round-trip on the HOST (ml_dtypes), like extraction does — an in-jit
    # convert chain gets elided by the XLA simplifier and measures nothing
    feats = np.asarray(stem(vgg, detp, dets, video)).astype(ml_dtypes.bfloat16)
    fp8 = feats.astype(ml_dtypes.float8_e4m3fn)
    f32, rt32 = feats.astype(np.float32), fp8.astype(np.float32)
    ferr = np.abs(f32 - rt32).max() / np.abs(f32).max()

    l16 = np.asarray(logits(params, state, jnp.asarray(feats), q, v_len, q_len),
                     dtype=np.float64)
    l8 = np.asarray(logits(params, state, jnp.asarray(fp8), q, v_len, q_len),
                    dtype=np.float64)

    abs_err = np.abs(l16 - l8)
    scale = np.abs(l16).max()
    p16 = np.asarray(jax.nn.softmax(jnp.asarray(l16), axis=-1))
    p8 = np.asarray(jax.nn.softmax(jnp.asarray(l8), axis=-1))
    argmax_agree = float(np.mean(np.argmax(l16, -1) == np.argmax(l8, -1)))
    tv = float(np.max(np.sum(np.abs(p16 - p8), -1)) / 2)

    print(f"model={model} batch={batch} config=eval.sh flagship (5x1024)")
    print(f"max relative feature error (fp8 round-trip): {float(ferr):.4%}")
    print(f"logit scale (max |bf16|):     {scale:.4f}")
    print(f"max abs logit drift:          {abs_err.max():.4f}")
    print(f"max relative drift:           {abs_err.max() / scale:.4%}")
    print(f"argmax agreement:             {argmax_agree:.4%}")
    print(f"max total-variation distance: {tv:.4f}")


if __name__ == "__main__":
    main(*sys.argv[1:2])
