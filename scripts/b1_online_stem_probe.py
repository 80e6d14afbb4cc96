"""Real-chip probe: where does BATCH-1 ONLINE-STEM serving latency go?

VERDICT r4 #8: batch-1 serving is ~2.5-4 ms/video from cached features but
12.6 ms with the online stem — a 5x gap for ~0.86 TFLOP/video of stem
compute that rooflines at ~4.4 ms (bf16 v5e). This isolates, at B=1:

  1. the bf16 stem alone (stem.stem_features: VGG partial + ObjDetectCNN,
     35 frames folded — the reference loops them, eval/q_and_v_eval.py:101-110)
  2. the STATIC-calibrated int8 stem alone (stem.quant.stem_features_int8)
  3. the full online serving forward with each stem (+ pallas kernels +
     static int8 trunk — the cli.serve video-mode recipe)
  4. the same at a trimmed frame bucket (T=20) — online serving buckets too

Run on the real chip: python scripts/b1_online_stem_probe.py [--frames 35]
All timings use host value-fetch fences (PERF.md axon gotcha).
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

_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      ".xla_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from videonavqa_tpu.models import ModelConfig, get_model
from videonavqa_tpu.stem import init_obj_detector, init_vgg_partial, stem_features
from videonavqa_tpu.stem.quant import (
    calibrate_act_scales, quantize_stem, stem_features_int8)


def bench(fn, args, n=30, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    leaf = jax.tree.leaves(out)[0]
    float(jax.device_get(leaf.ravel()[0].astype(jnp.float32)))
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    leaf = jax.tree.leaves(out)[0]
    float(jax.device_get(leaf.ravel()[0].astype(jnp.float32)))
    return (time.time() - t0) / n * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, nargs="+", default=[35, 20])
    ap.add_argument("--iters", type=int, default=30)
    a = ap.parse_args()

    key = jax.random.PRNGKey(0)
    vgg = init_vgg_partial(key)
    detp, dets = init_obj_detector(jax.random.split(key)[0])

    cfg = ModelConfig(model="film_attn_pt", num_res_blocks=5,
                      num_res_block_channels=1024, num_tail_channels=64,
                      at_hidden_size=128, max_num_frames=35,
                      compute_dtype="bfloat16", use_pallas_kernels=True)
    spec = get_model("film_attn_pt")
    params, state = spec.init(key, cfg)

    for T in a.frames:
        video = jax.device_put(np.random.RandomState(0).rand(
            1, T, 160, 208, 3).astype(np.float32))
        q = jax.device_put(np.ones((1, 56), np.int32))
        vl = jnp.array([T]); ql = jnp.array([14])

        stem_bf16 = jax.jit(lambda v: stem_features(vgg, detp, dets, v))
        t_stem = bench(stem_bf16, (video,), a.iters)

        # static-calibrated int8 stem (the cli.serve --int8_stem recipe)
        scales = calibrate_act_scales(vgg, detp, dets, video)
        qstem = quantize_stem(vgg, detp, act_scales=scales)
        stem_i8 = jax.jit(lambda v: stem_features_int8(qstem, detp, dets, v))
        t_stem8 = bench(stem_i8, (video,), a.iters)

        # full online serving forward (stem -> trunk -> tail), int8 trunk
        cal_cfg = dataclasses.replace(cfg, use_int8_trunk=True,
                                      int8_trunk_calibrate=True,
                                      use_pallas_kernels=False)
        feats = stem_bf16(video)
        batch = {"v_features": feats, "question": q, "v_len": vl, "q_len": ql}
        _, cal_state = spec.apply(params, state, batch, cal_cfg, train=False,
                                  rng=jax.random.PRNGKey(1))
        cfg8 = dataclasses.replace(cfg, use_int8_trunk=True)

        def full(stem_fn):
            def f(v, q, vl, ql):
                feats = stem_fn(v)
                b = {"v_features": feats, "question": q,
                     "v_len": vl, "q_len": ql}
                out, _ = spec.apply(params, cal_state, b, cfg8, train=False,
                                    rng=jax.random.PRNGKey(0))
                return out
            return jax.jit(f)

        t_full = bench(full(lambda v: stem_features(vgg, detp, dets, v)),
                       (video, q, vl, ql), a.iters)
        t_full8 = bench(full(lambda v: stem_features_int8(qstem, detp, dets, v)),
                        (video, q, vl, ql), a.iters)
        # trunk+tail from device-resident features = the cached-serving step
        trunk_only = jax.jit(lambda f_, q_, vl_, ql_: spec.apply(
            params, cal_state, {"v_features": f_, "question": q_,
                                "v_len": vl_, "q_len": ql_},
            cfg8, train=False, rng=jax.random.PRNGKey(0))[0])
        t_trunk = bench(trunk_only, (feats, q, vl, ql), a.iters)

        print(f"T={T:2d}  stem bf16 {t_stem:6.2f} ms | stem int8 "
              f"{t_stem8:6.2f} ms ({t_stem / t_stem8:.2f}x) | trunk+tail "
              f"{t_trunk:5.2f} ms | full online bf16-stem {t_full:6.2f} ms | "
              f"full online int8-stem {t_full8:6.2f} ms "
              f"({t_full / t_full8:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
