"""Real-chip probe: fused VGG block-1 Pallas kernel vs plain XLA stem.

Measures the full fused stem (VGG partial + obj detector) with block 1
running through kernels/vgg_block1_pallas.py, vs the plain XLA lowering, at
batch-1 serving scale (35 folded frames) and train scale (140), plus the
isolated block-1 comparison. Numerics are checked on-chip.

Run on the real chip: python scripts/stem_block1_pallas_probe.py
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

from videonavqa_tpu.kernels.vgg_block1_pallas import (
    vgg_block1_pallas, vgg_partial_w2d_pallas)
from videonavqa_tpu.ops.conv import conv2d, max_pool2d
from videonavqa_tpu.stem import init_obj_detector, init_vgg_partial
from videonavqa_tpu.stem.obj_detector import obj_detector_features
from videonavqa_tpu.stem.vgg import relay_w2d_block1, vgg_partial


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
    rw = relay_w2d_block1(vgg)

    def block1_plain(fr):
        h = jax.nn.relu(conv2d(vgg["conv1_1"], fr, dtype=jnp.bfloat16))
        h = jax.nn.relu(conv2d(vgg["conv1_2"], h, dtype=jnp.bfloat16))
        return max_pool2d(h)

    def stem_plain(fr):
        return obj_detector_features(detp, dets, vgg_partial(vgg, fr),
                                     dtype=jnp.bfloat16)

    def stem_pallas(fr):
        return obj_detector_features(
            detp, dets, vgg_partial_w2d_pallas(rw, vgg, fr),
            dtype=jnp.bfloat16)

    for N in a.frames:
        x = jax.device_put(np.random.RandomState(0).rand(
            N, 160, 208, 3).astype(np.float32))
        fb = jax.jit(block1_plain)
        fk = jax.jit(lambda fr: vgg_block1_pallas(rw, fr))
        tb, tk = bench(fb, x, n=a.iters), bench(fk, x, n=a.iters)
        d1 = float(jnp.max(jnp.abs(fb(x).astype(jnp.float32)
                                   - fk(x).astype(jnp.float32))))
        fp, fq = jax.jit(stem_plain), jax.jit(stem_pallas)
        tp, tq = bench(fp, x, n=a.iters), bench(fq, x, n=a.iters)
        d2 = float(jnp.max(jnp.abs(fp(x).astype(jnp.float32)
                                   - fq(x).astype(jnp.float32))))
        print(f"N={N:4d}  block1 xla {tb:6.2f} ms | pallas {tk:6.2f} ms "
              f"({tb / tk:.2f}x)  diff {d1:.2e} || full stem xla {tp:6.2f} ms"
              f" | pallas-block1 {tq:6.2f} ms ({tp / tq:.2f}x)  diff {d2:.2e}",
              flush=True)


if __name__ == "__main__":
    main()
