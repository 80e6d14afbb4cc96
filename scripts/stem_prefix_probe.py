"""In-situ stem layer attribution: time fused PREFIXES of the frozen stem.

scripts/stem_anatomy_probe.py's isolated-layer timings don't add up (sum
25.45 ms vs 8.42 ms whole at T=35): isolation pays per-call dispatch, reads
f32 inputs, and loses XLA's cross-layer fusion/layout choices. Timing the
fused prefix up to each layer and differencing attributes cost as the layer
actually runs inside the compiled stem. Stem being dissected:
eval/q_and_v_eval.py:17,306-310 + models/obj_detector.py:72-86.

Run on the real chip: python scripts/stem_prefix_probe.py [--frames 35]
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
from videonavqa_tpu.ops.norm import batch_norm
from videonavqa_tpu.stem import init_obj_detector, init_vgg_partial


def bench(fn, *args, n=30, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    float(jax.device_get(jax.tree.leaves(out)[0].ravel()[0].astype(jnp.float32)))
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    float(jax.device_get(jax.tree.leaves(out)[0].ravel()[0].astype(jnp.float32)))
    return (time.time() - t0) / n * 1e3


def stem_stages(vgg, detp, dets):
    """The stem as an ordered list of (name, fn) running on bf16 activations."""
    relu = jax.nn.relu

    def bn(name):
        return lambda h: batch_norm(detp[name], dets[name], h, train=False)[0]

    return [
        ("vgg conv1_1+relu", lambda h: relu(conv2d(vgg["conv1_1"], h, dtype=jnp.bfloat16))),
        ("vgg conv1_2+relu", lambda h: relu(conv2d(vgg["conv1_2"], h, dtype=jnp.bfloat16))),
        ("pool1           ", max_pool2d),
        ("vgg conv2_1+relu", lambda h: relu(conv2d(vgg["conv2_1"], h, dtype=jnp.bfloat16))),
        ("vgg conv2_2+relu", lambda h: relu(conv2d(vgg["conv2_2"], h, dtype=jnp.bfloat16))),
        ("pool2           ", max_pool2d),
        ("obj bn_input    ", bn("bn_input")),
        ("obj conv11      ", lambda h: conv2d(detp["conv11"], h, dtype=jnp.bfloat16)),
        ("obj conv12+bnrelu", lambda h: relu(bn("bn1")(conv2d(detp["conv12"], h, dtype=jnp.bfloat16)))),
        ("pool            ", max_pool2d),
        ("obj conv21      ", lambda h: conv2d(detp["conv21"], h, dtype=jnp.bfloat16)),
        ("obj conv22+bnrelu", lambda h: relu(bn("bn2")(conv2d(detp["conv22"], h, dtype=jnp.bfloat16)))),
        ("pool            ", max_pool2d),
        ("obj conv31      ", lambda h: conv2d(detp["conv31"], h, dtype=jnp.bfloat16)),
        ("obj conv32+bnrelu", lambda h: relu(bn("bn3")(conv2d(detp["conv32"], h, dtype=jnp.bfloat16)))),
    ]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=35)
    ap.add_argument("--iters", type=int, default=30)
    a = ap.parse_args()
    N = a.frames
    key = jax.random.PRNGKey(0)
    vgg = init_vgg_partial(key)
    detp, dets = init_obj_detector(jax.random.split(key)[0])
    stages = stem_stages(vgg, detp, dets)

    x0 = jax.device_put(np.random.RandomState(0).rand(
        N, 160, 208, 3).astype(np.float32))

    prev = 0.0
    print(f"T={N} folded frames; fused-prefix deltas (30-iter means)")
    for k in range(1, len(stages) + 1):
        fns = [f for _, f in stages[:k]]

        def prefix(x, fns=fns):
            h = x.astype(jnp.bfloat16)
            for f in fns:
                h = f(h)
            # tiny reduction so the final layer can't be DCE'd/layout-elided
            return jnp.sum(h.astype(jnp.float32))

        ms = bench(jax.jit(prefix), x0, n=a.iters)
        print(f"  +{stages[k - 1][0]}  prefix {ms:6.2f} ms  (delta "
              f"{ms - prev:+6.2f} ms)", flush=True)
        prev = ms


if __name__ == "__main__":
    main()
