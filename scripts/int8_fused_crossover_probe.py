"""Real-chip probe: find the row-count crossover between the XLA prequant
int8 1x1 path and the fused Pallas kernel (kernels/int8_matmul_pallas.py).

Round-4 evidence (BENCH_r04.json line 3 vs PERF.md): the fused kernel wins at
batch 1 but loses ~2.3x at batch 32 — so the serving path needs a row-count
gate, not a blanket switch. This sweep times both variants (plus the
dual-output requant form) at the trunk channel width over a range of row
counts (rows = B * T * 10 * 13 at the flagship serving shapes) and prints the
measured crossover to set models/film.py's gate.

Run on the real chip: python scripts/int8_fused_crossover_probe.py
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      ".xla_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from videonavqa_tpu.kernels.int8_matmul_pallas import matmul_int8_fused_pallas
from videonavqa_tpu.ops.quant import (
    conv2d_int8_prequant, quantize_weight_channelwise)


def bench(f, args, n=30):
    y = f(*args)
    y = y[0] if isinstance(y, tuple) else y
    float(jax.device_get(y.ravel()[0].astype(jnp.float32)))
    t0 = time.time()
    for _ in range(n):
        y = f(*args)
        y = y[0] if isinstance(y, tuple) else y
    float(jax.device_get(y.ravel()[0].astype(jnp.float32)))
    return (time.time() - t0) / n * 1000.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--channels", type=int, default=1024)
    ap.add_argument("--batches", type=int, nargs="+",
                    default=[1, 2, 4, 8, 16, 32],
                    help="effective batch sizes at T=35 (rows = B*35*130)")
    ap.add_argument("--frames", type=int, default=35)
    a = ap.parse_args()

    C = a.channels
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (1, 1, C, C)) * 0.1
    wq, sw = quantize_weight_channelwise(w)
    absmax = jnp.float32(12.7)
    nxt = jnp.float32(9.3)

    xla = jax.jit(lambda x: jax.nn.relu(conv2d_int8_prequant(
        wq, sw, None, x, absmax, out_dtype=jnp.bfloat16)))
    fused = jax.jit(lambda x: matmul_int8_fused_pallas(
        x, wq[0, 0], sw, None, absmax, relu=True, out_dtype=jnp.bfloat16))
    fused2 = jax.jit(lambda x: matmul_int8_fused_pallas(
        x, wq[0, 0], sw, None, absmax, relu=True, next_absmax=nxt,
        out_dtype=jnp.bfloat16))

    print(f"{'B':>3} {'rows':>7} {'xla ms':>8} {'fused ms':>9} "
          f"{'fused2 ms':>9} {'fused/xla':>9}")
    crossover = None
    for B in a.batches:
        x = jax.random.normal(key, (B * a.frames, 10, 13, C), jnp.bfloat16)
        rows = B * a.frames * 10 * 13
        ta = bench(xla, (x,))
        tb = bench(fused, (x,))
        tc = bench(fused2, (x,))
        print(f"{B:>3} {rows:>7} {ta:>8.3f} {tb:>9.3f} {tc:>9.3f} "
              f"{ta / tb:>9.2f}x", flush=True)
        if crossover is None and tb > ta:
            crossover = rows
    if crossover is not None:
        print(f"fused kernel loses from rows >= {crossover}; gate below that")
    else:
        print("fused kernel won at every measured size")


if __name__ == "__main__":
    main()
