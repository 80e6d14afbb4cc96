"""Attribute the int8 trunk's roofline gap (49.8 ms measured vs ~42 ms int8
roofline at the flagship B=32, T=35 shape — scripts/serving_step_anatomy.py).

Times isolated variants of the trunk's two conv shapes on the real chip:
  1x1: [B*T, 10, 13, 1024] x [1, 1, 1024, 1024]
  3x3: [B*T, 10, 13, 1024] x [3, 3, 1024, 1024]

Variants per shape:
  a. int8 lax.conv, activation quantize IN-GRAPH (the shipped path)
  b. int8 lax.conv, input already int8 (isolates the act-quant cost)
  c. 1x1 only: int8 dot_general over flattened spatial (matmul lowering)
  d. int8 lax.conv with W padded 13 -> 16 (tile-alignment effect)
  e. bf16 lax.conv (the non-quantized baseline)

Run on the real chip: python scripts/trunk_gap_probe.py [--batch 32]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

_DN2D = ("NHWC", "HWIO", "NHWC")


def bench(fn, args, n=30, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    float(jax.device_get(out.ravel()[0]))
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    float(jax.device_get(out.ravel()[0]))
    return (time.time() - t0) / n * 1000.0


def conv_i8(xq, wq, pad="SAME"):
    return lax.conv_general_dilated(
        xq, wq, window_strides=(1, 1), padding=pad, dimension_numbers=_DN2D,
        preferred_element_type=jnp.int32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--frames", type=int, default=35)
    args = ap.parse_args()

    N = args.batch * args.frames
    C = 1024
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (N, 10, 13, C), jnp.bfloat16)
    xq8 = jnp.clip(jnp.round(x.astype(jnp.float32) * 10), -127, 127).astype(jnp.int8)

    for k in (1, 3):
        w = jax.random.normal(key, (k, k, C, C), jnp.float32)
        wq = jnp.clip(jnp.round(w * 10), -127, 127).astype(jnp.int8)
        flops = 2 * N * 10 * 13 * C * C * k * k

        @jax.jit
        def a_quant_conv(x, wq):
            sx = jnp.float32(0.1)
            xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx),
                          -127, 127).astype(jnp.int8)
            return conv_i8(xq, wq).astype(jnp.float32) * sx

        @jax.jit
        def b_prequant_conv(xq, wq):
            return conv_i8(xq, wq).astype(jnp.float32)

        @jax.jit
        def e_bf16_conv(x, w):
            return lax.conv_general_dilated(
                x, w.astype(jnp.bfloat16), window_strides=(1, 1),
                padding="SAME", dimension_numbers=_DN2D)

        ta = bench(a_quant_conv, (x, wq))
        tb = bench(b_prequant_conv, (xq8, wq))
        te = bench(e_bf16_conv, (x, w))
        print(f"\nk={k} ({flops/1e12:.2f} TFLOP, int8 roofline "
              f"~{flops/394e12*1000:.1f} ms @394T, bf16 ~{flops/197e12*1000:.1f} ms):")
        print(f"  a. int8 conv + in-graph act quant: {ta:7.2f} ms "
              f"({flops/ta/1e9:.0f} GFLOP/ms)")
        print(f"  b. int8 conv, pre-int8 input:      {tb:7.2f} ms "
              f"(act-quant cost {ta-tb:+.2f} ms)")
        print(f"  e. bf16 conv:                      {te:7.2f} ms")

        if k == 1:
            @jax.jit
            def c_matmul(xq, wq):
                acc = lax.dot_general(
                    xq.reshape(-1, C), wq.reshape(C, C),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                return acc.reshape(N, 10, 13, C).astype(jnp.float32)

            tc = bench(c_matmul, (xq8, wq))
            print(f"  c. int8 1x1 as dot_general:        {tc:7.2f} ms")

        @jax.jit
        def d_padded(xq, wq):
            xp = jnp.pad(xq, ((0, 0), (0, 0), (0, 3), (0, 0)))
            y = conv_i8(xp, wq)
            return y[:, :, :13, :].astype(jnp.float32)

        td = bench(d_padded, (xq8, wq))
        print(f"  d. int8 conv, W padded 13->16:     {td:7.2f} ms")


if __name__ == "__main__":
    main()
