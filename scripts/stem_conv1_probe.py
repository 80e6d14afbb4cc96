"""Probe: how much does VGG conv1's 3-channel input cost on the MXU?

conv1 (3->64 @ 160x208) is ~5% of stem FLOPs but C_in=3 underutilizes the
128-lane MXU. Candidate layouts, all numerically exact:
  a) plain NHWC conv (XLA's choice)
  b) im2col: extract 3x3 patches -> [N*H*W, 27] @ [27, 64] matmul
  c) input packed to C_in=4 with a zero channel (better lane alignment)
Run on the real chip: python scripts/stem_conv1_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".xla_cache"))


def timeit(f, *args, n=10):
    r = f(*args)
    jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(n):
        r = f(*args)
    jax.block_until_ready(r)
    return (time.time() - t0) / n * 1000


def main():
    N, H, W = 320, 160, 208  # ~batch 32 x 20 frames
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (N, H, W, 3), jnp.bfloat16)
    w = jax.random.normal(key, (3, 3, 3, 64), jnp.bfloat16) * 0.1
    b = jnp.zeros((64,), jnp.bfloat16)
    dn = ("NHWC", "HWIO", "NHWC")

    @jax.jit
    def conv_plain(x, w, b):
        return jax.lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                            dimension_numbers=dn) + b

    @jax.jit
    def conv_im2col(x, w, b):
        # pad spatial, gather 3x3 patches into channels, one big matmul
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        cols = [xp[:, dy:dy + H, dx:dx + W, :] for dy in range(3) for dx in range(3)]
        patches = jnp.concatenate(cols, axis=-1)          # [N,H,W,27]
        wm = w.transpose(0, 1, 2, 3).reshape(27, 64)       # [27,64]
        return jnp.einsum("nhwc,co->nhwo", patches, wm) + b

    @jax.jit
    def conv_pad4(x, w, b):
        x4 = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 1)))
        w4 = jnp.pad(w, ((0, 0), (0, 0), (0, 1), (0, 0)))
        return jax.lax.conv_general_dilated(x4, w4, (1, 1), "SAME",
                                            dimension_numbers=dn) + b

    # conv2 (64->64) for scale
    x64 = jax.random.uniform(key, (N, H, W, 64), jnp.bfloat16)
    w64 = jax.random.normal(key, (3, 3, 64, 64), jnp.bfloat16) * 0.1

    @jax.jit
    def conv2(x, w, b):
        return jax.lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                            dimension_numbers=dn) + b

    r0 = np.asarray(conv_plain(x, w, b), np.float32)
    for name, f, args in (("plain", conv_plain, (x, w, b)),
                          ("im2col", conv_im2col, (x, w, b)),
                          ("pad4", conv_pad4, (x, w, b))):
        r = np.asarray(f(*args), np.float32)
        err = np.abs(r - r0).max()
        ms = timeit(f, *args)
        flops = 2 * N * H * W * 9 * 3 * 64
        print(f"conv1/{name}: {ms:7.2f} ms  ({flops / ms / 1e9:6.1f} GFLOP/ms eff)  maxerr={err:.4f}")
    ms2 = timeit(conv2, x64, w64, b)
    flops2 = 2 * N * H * W * 9 * 64 * 64
    print(f"conv2/plain:  {ms2:7.2f} ms  ({flops2 / ms2 / 1e9:6.1f} GFLOP/ms eff)")


if __name__ == "__main__":
    main()
