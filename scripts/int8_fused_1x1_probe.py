"""Real-chip probe: fused int8 1x1 kernel (kernels/int8_matmul_pallas.py)
vs the XLA prequant path, at the flagship trunk shape [32*35, 10, 13, 1024].

Checks numerics (int8 codes exact, f32 epilogue to round-off) and times
three variants:
  a. XLA conv2d_int8_prequant + relu (the pre-kernel serving path)
  b. fused kernel, single output (quantize+matmul+dequant+relu in VMEM)
  c. fused kernel, dual output (b + requant for the next conv's int8 input)

Run on the real chip: python scripts/int8_fused_1x1_probe.py [--batch 32]
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
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--frames", type=int, default=35)
    a = ap.parse_args()

    C = 1024
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (a.batch * a.frames, 10, 13, C), jnp.bfloat16)
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

    ref = np.asarray(xla(x), dtype=np.float32)
    got = np.asarray(fused(x), dtype=np.float32)
    print("max abs diff fused vs xla (bf16 out):", float(np.max(np.abs(got - ref))))

    ta = bench(xla, (x,))
    tb = bench(fused, (x,))
    tc = bench(fused2, (x,))
    print(f"a. XLA prequant int8 1x1 + relu:    {ta:7.3f} ms")
    print(f"b. fused pallas (single output):    {tb:7.3f} ms ({ta/tb:.2f}x)")
    print(f"c. fused pallas (+int8 requant out):{tc:7.3f} ms")


if __name__ == "__main__":
    main()
