"""Real-chip probe: STATIC calibrated int8 trunk scales vs dynamic vs bf16.

Flagship film_attn serving step (eval mode, cached features, pallas on),
batch 32 and batch 1, T=35. Dynamic int8 wins at batch 32 but LOSES at
batch 1 (the per-conv absmax reductions are latency-bound, PERF.md); static
scales recorded by one calibration forward (models/film.py
int8_trunk_calibrate) remove those reductions entirely.

Run: python scripts/int8_static_probe.py [--iters 30]
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
from videonavqa_tpu.train.step import make_eval_step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    key = jax.random.PRNGKey(0)
    base = ModelConfig(model="film_attn_pt", num_res_blocks=5,
                       num_res_block_channels=1024, at_hidden_size=128,
                       use_pallas_kernels=True)
    spec = get_model("film_attn_pt")
    params, state = spec.init(key, base)
    T = 35

    # one calibration forward (f32, records absmax into state)
    cal_cfg = dataclasses.replace(base, use_int8_trunk=True,
                                  int8_trunk_calibrate=True)
    cal_batch = {"v_features": jax.random.normal(key, (8, T, 10, 13, 512),
                                                 jnp.bfloat16),
                 "question": jax.random.randint(key, (8, 56), 1,
                                                base.vocab_size),
                 "v_len": jnp.full((8,), T, jnp.int32),
                 "q_len": jnp.full((8,), 12, jnp.int32)}
    _, cal_state = jax.jit(
        lambda p, s, b: spec.apply(p, s, b, cal_cfg, train=False,
                                   rng=jax.random.PRNGKey(1)))(
        params, state, cal_batch)
    print("calibrated scales:",
          {k: round(float(v), 1)
           for k, v in cal_state["trunk"]["int8_scales"].items()},
          flush=True)

    int8_cfg = dataclasses.replace(base, use_int8_trunk=True)
    modes = [("bf16", base, state), ("int8-dyn", int8_cfg, state),
             ("int8-static", int8_cfg, cal_state)]
    results = {}
    ref_logits = {}
    for B in (32, 1):
        batch = {"v_features": jax.random.normal(key, (B, T, 10, 13, 512),
                                                 jnp.bfloat16),
                 "question": jax.random.randint(key, (B, 56), 1,
                                                base.vocab_size),
                 "v_len": jnp.full((B,), T, jnp.int32),
                 "q_len": jnp.full((B,), 12, jnp.int32),
                 "label": jax.random.randint(key, (B,), 0, base.num_classes)}
        for name, cfg, st in modes:
            step = make_eval_step(spec, cfg, reduction="sum")
            rng = jax.random.PRNGKey(1)
            t0 = time.time()
            m = step(params, st, batch, rng)
            float(jax.device_get(m["loss"]))
            compile_s = time.time() - t0
            t0 = time.time()
            for _ in range(args.iters):
                m = step(params, st, batch, rng)
            float(jax.device_get(m["loss"]))
            dt = (time.time() - t0) / args.iters
            results[(B, name)] = dt
            if B == 32:
                ref_logits[name] = np.asarray(
                    jax.device_get(m["preds"]))
            print(f"B={B:2d} {name:12s} {dt * 1e3:8.2f} ms/step "
                  f"({B / dt:7.1f} videos/s)  [compile {compile_s:.0f}s]",
                  flush=True)

    for B in (32, 1):
        bf = results[(B, "bf16")]
        print(f"B={B:2d}: static x{bf / results[(B, 'int8-static')]:.3f} "
              f"vs bf16; dyn x{bf / results[(B, 'int8-dyn')]:.3f}",
              flush=True)
    agree = float(np.mean(ref_logits["int8-static"] == ref_logits["bf16"]))
    print(f"B=32 argmax agreement static-vs-bf16: {agree:.3f}", flush=True)


if __name__ == "__main__":
    main()
