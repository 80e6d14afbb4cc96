"""Measure the Pallas fused attn-tail kernel against the XLA scan on the real
chip (VERDICT r2 #3): flagship film_attn serving step (eval mode), batch 32
and batch 1, T=35. Prints one line per config.

Run: python scripts/pallas_serving_bench.py [--feature_cache]
"""

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from videonavqa_tpu.models import ModelConfig, get_model
from videonavqa_tpu.stem import init_obj_detector, init_vgg_partial, stem_features
from videonavqa_tpu.train.step import make_eval_step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--feature_cache", action="store_true",
                    help="trunk-only serving from cached features (no stem)")
    ap.add_argument("--int8_trunk", action="store_true",
                    help="compare int8-trunk serving (with pallas kernels on "
                         "both sides) instead of pallas-vs-scan")
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    key = jax.random.PRNGKey(0)
    base = ModelConfig(model="film_attn_pt", num_res_blocks=5,
                       num_res_block_channels=1024, at_hidden_size=128)
    spec = get_model("film_attn_pt")
    params, state = spec.init(key, base)

    if args.feature_cache:
        stem_fn = None
    else:
        vgg = init_vgg_partial(key)
        det, det_state = init_obj_detector(key)

        def stem_fn(video):
            return stem_features(vgg, det, det_state, video)

    T = 35
    results = {}
    for B in (32, 1):
        if args.feature_cache:
            visual = {"v_features": jax.random.normal(
                key, (B, T, 10, 13, 512), jnp.bfloat16)}
        else:
            visual = {"video": jax.random.uniform(
                key, (B, T, 160, 208, 3), jnp.float32)}
        batch = {**visual,
                 "question": jax.random.randint(key, (B, 56), 1, base.vocab_size),
                 "v_len": jnp.full((B,), T, jnp.int32),
                 "q_len": jnp.full((B,), 12, jnp.int32),
                 "label": jax.random.randint(key, (B,), 0, base.num_classes)}
        for flag in (False, True):
            if args.int8_trunk:
                cfg = dataclasses.replace(base, use_pallas_kernels=True,
                                          use_int8_trunk=flag)
            else:
                cfg = dataclasses.replace(base, use_pallas_kernels=flag)
            step = make_eval_step(spec, cfg, reduction="sum", stem_fn=stem_fn)
            rng = jax.random.PRNGKey(1)
            t0 = time.time()
            m = step(params, state, batch, rng)
            float(jax.device_get(m["loss"]))
            compile_s = time.time() - t0
            # timed: hard value fence each iter would serialize; fence once
            t0 = time.time()
            for _ in range(args.iters):
                m = step(params, state, batch, rng)
            float(jax.device_get(m["loss"]))
            dt = (time.time() - t0) / args.iters
            results[(B, flag)] = dt
            label = "int8" if args.int8_trunk else "pallas"
            print(f"B={B:2d} {label}={int(flag)} {dt * 1e3:8.2f} ms/step "
                  f"({B / dt:8.1f} videos/s)  [compile {compile_s:.0f}s]",
                  flush=True)

    label = "int8_trunk" if args.int8_trunk else "pallas"
    for B in (32, 1):
        base_t, pal_t = results[(B, False)], results[(B, True)]
        print(f"B={B:2d}: {label} speedup x{base_t / pal_t:.3f} "
              f"({(base_t - pal_t) * 1e3:+.2f} ms/step)", flush=True)


if __name__ == "__main__":
    main()
