"""Probe: torch-order flatten+linear vs einsum that re-lays the WEIGHT.

The film tails flatten trunk activations [B,T,10,13,C] in torch (C,H,W)
memory order so imported tail weights line up (models/film.py _flatten_chw).
That is a physical transpose of the step's largest tensor (~600 MB f32 at the
flagship batch-32 shape) executed every step; the mathematically identical
contraction `einsum('bthwc,achw->bta')` lets XLA transpose the 17M-param
weight instead.

Run on the real chip: python scripts/flatten_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

B, T, H, W, C, A = 32, 35, 10, 13, 1024, 128


def bench(fn, args, n=30, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    float(jax.device_get(out.ravel()[0]))
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    float(jax.device_get(out.ravel()[0]))
    return (time.time() - t0) / n * 1000.0


def main():
    key = jax.random.PRNGKey(0)
    for dt in (jnp.float32, jnp.bfloat16):
        x = jax.random.normal(key, (B, T, H, W, C), dt)
        w = jax.random.normal(key, (A, C * H * W), jnp.float32)
        b = jnp.zeros((A,), jnp.float32)

        @jax.jit
        def flat_linear(x, w, b):
            xt = jnp.transpose(x, (0, 1, 4, 2, 3)).reshape(B, T, -1)
            return xt.astype(jnp.float32) @ w.T + b

        @jax.jit
        def eins(x, w, b):
            w2 = w.reshape(A, C, H, W)
            return jnp.einsum("bthwc,achw->bta", x.astype(jnp.float32), w2,
                              preferred_element_type=jnp.float32) + b

        t1 = bench(flat_linear, (x, w, b))
        t2 = bench(eins, (x, w, b))
        y1 = flat_linear(x, w, b)
        y2 = eins(x, w, b)
        err = float(jnp.max(jnp.abs(y1 - y2)) / (jnp.max(jnp.abs(y1)) + 1e-9))
        print(f"dtype={dt.__name__}: transpose+matmul {t1:.2f} ms, "
              f"einsum {t2:.2f} ms ({t1 / t2:.2f}x), rel err {err:.2e}")


if __name__ == "__main__":
    main()
