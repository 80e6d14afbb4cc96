"""Per-layer anatomy of the frozen stem at BATCH-1 serving shapes.

VERDICT r4 #8 follow-up: scripts/b1_online_stem_probe.py measured the bf16
stem at 8.45 ms for T=35 folded frames vs a ~4.4 ms bf16 roofline, with the
int8 stem only 1.06x — so the gap is not MXU peak. This times every conv of
the stem individually (the VGG partial's 64/128-channel convs at 160x208 /
80x104, then the ObjDetectCNN's 512-channel stack) to locate the off-roofline
time. Reference stem being dissected: eval/q_and_v_eval.py:17,306-310 (VGG
partial) + models/obj_detector.py:72-86 (detector features).

Run on the real chip: python scripts/stem_anatomy_probe.py [--frames 35]
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

from videonavqa_tpu.ops.conv import conv2d, max_pool2d
from videonavqa_tpu.ops import initializers as init
from videonavqa_tpu.stem import init_obj_detector, init_vgg_partial, stem_features


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
    ap.add_argument("--frames", type=int, default=35)
    ap.add_argument("--iters", type=int, default=30)
    a = ap.parse_args()
    N = a.frames
    key = jax.random.PRNGKey(0)
    rs = np.random.RandomState(0)

    # (name, H, W, cin, cout) for every conv in stem order; pools noted inline
    layers = [
        ("vgg conv1_1", 160, 208, 3, 64),
        ("vgg conv1_2", 160, 208, 64, 64),
        ("vgg conv2_1", 80, 104, 64, 128),
        ("vgg conv2_2", 80, 104, 128, 128),
        ("obj conv11 ", 40, 52, 128, 512),
        ("obj conv12 ", 40, 52, 512, 512),
        ("obj conv21 ", 20, 26, 512, 512),
        ("obj conv22 ", 20, 26, 512, 512),
        ("obj conv31 ", 10, 13, 512, 512),
        ("obj conv32 ", 10, 13, 512, 512),
    ]
    total = 0.0
    print(f"T={N} folded frames, bf16 convs, 30-iter means "
          f"(relu fused into each conv like the real stem)")
    for name, H, W, cin, cout in layers:
        k, key = jax.random.split(key)
        p = init.reference_conv2d(k, 3, 3, cin, cout)
        x = jax.device_put(rs.rand(N, H, W, cin).astype(np.float32))
        f = jax.jit(lambda p_, x_: jax.nn.relu(conv2d(p_, x_, dtype=jnp.bfloat16)))
        ms = bench(f, p, x, n=a.iters)
        gf = N * H * W * cout * cin * 9 * 2 / 1e9
        total += ms
        print(f"  {name} [{N}x{H}x{W}x{cin}->{cout}]  {ms:6.2f} ms  "
              f"{gf:7.1f} GF  {gf / ms:6.1f} TF/s", flush=True)

    # the two 2x2 max pools at full width (the big ones)
    for name, H, W, c in (("pool1", 160, 208, 64), ("pool2", 80, 104, 128)):
        x = jax.device_put(rs.rand(N, H, W, c).astype(np.float32))
        f = jax.jit(lambda x_: max_pool2d(x_.astype(jnp.bfloat16)))
        ms = bench(f, x, n=a.iters)
        total += ms
        print(f"  {name} [{N}x{H}x{W}x{c}]  {ms:6.2f} ms", flush=True)

    vgg = init_vgg_partial(key)
    detp, dets = init_obj_detector(jax.random.split(key)[0])
    video = jax.device_put(rs.rand(1, N, 160, 208, 3).astype(np.float32))
    whole = bench(jax.jit(lambda v: stem_features(vgg, detp, dets, v)),
                  video, n=a.iters)
    print(f"  sum of isolated layers: {total:6.2f} ms | whole fused stem: "
          f"{whole:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
