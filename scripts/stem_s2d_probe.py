"""Real-chip probe: space-to-depth conv1_1 in the frozen stem.

stem_prefix_probe.py measured conv1_1 in-situ at 1.34 ms of the 8.42 ms
T=35 stem — 3 TF/s, the stem's worst layer (3 input channels = a 27-element
MXU contraction). relay_s2d_conv1_1 re-expresses it exactly as [3,3,12,256]
on the half-resolution space-to-depth grid (contraction 108). This measures
the full fused stem with and without it, at batch-1 serving scale (35
folded frames) and train scale (4 videos = 140 frames), before any wiring —
VERDICT r4's "no unmeasured code in the hot path" rule.

Run on the real chip: python scripts/stem_s2d_probe.py
"""

import argparse
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

from videonavqa_tpu.stem import init_obj_detector, init_vgg_partial
from videonavqa_tpu.stem.obj_detector import obj_detector_features
from videonavqa_tpu.stem.vgg import (
    relay_s2d_block1, relay_s2d_conv1_1, relay_w2d_block1, vgg_partial,
    vgg_partial_s2d, vgg_partial_s2d_block1, vgg_partial_w2d_block1)


def bench(fn, *args, n=30, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    float(jax.device_get(jax.tree.leaves(out)[0].ravel()[0].astype(jnp.float32)))
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    float(jax.device_get(jax.tree.leaves(out)[0].ravel()[0].astype(jnp.float32)))
    return (time.time() - t0) / n * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, nargs="+", default=[35, 140])
    ap.add_argument("--iters", type=int, default=30)
    a = ap.parse_args()
    key = jax.random.PRNGKey(0)
    vgg = init_vgg_partial(key)
    detp, dets = init_obj_detector(jax.random.split(key)[0])
    r1 = relay_s2d_conv1_1(vgg)
    rs = relay_s2d_block1(vgg)
    rw = relay_w2d_block1(vgg)

    def stem_with(vgg_fn):
        def f(frames):
            return obj_detector_features(detp, dets, vgg_fn(frames),
                                         dtype=jnp.bfloat16)
        return jax.jit(f)

    variants = [
        ("plain           ", stem_with(lambda fr: vgg_partial(vgg, fr))),
        ("s2d conv1_1 only", stem_with(
            lambda fr: vgg_partial_s2d(r1, vgg, fr))),
        ("s2d block1      ", stem_with(
            lambda fr: vgg_partial_s2d_block1(rs, vgg, fr))),
        ("w2d block1      ", stem_with(
            lambda fr: vgg_partial_w2d_block1(rw, vgg, fr))),
    ]
    for N in a.frames:
        x = jax.device_put(np.random.RandomState(0).rand(
            N, 160, 208, 3).astype(np.float32))
        base = None
        ref = variants[0][1](x).astype(jnp.float32)
        for name, fn in variants:
            ms = bench(fn, x, n=a.iters)
            d = float(jnp.max(jnp.abs(ref - fn(x).astype(jnp.float32))))
            if base is None:
                base = ms
            print(f"N={N:4d}  {name}  {ms:6.2f} ms ({base / ms:.3f}x)  "
                  f"max|diff| {d:.2e}", flush=True)


if __name__ == "__main__":
    main()
