"""Real-chip probe: v_only_cnn3d frame-bucket trimming via the zero-run
splice (models/v_only_cnn3d.py c3d_trunk_trimmed).

The C3D trunk was the one zoo member excluded from length bucketing (its
padded tail flows through conv3d+BN3d, so naive trimming changes the
numbers); the splice recovers the exact full-volume result while paying
conv FLOPs only over the live prefix + one amortized full-width zero
example. This measures the eval step at the reference geometry
([B, T, 160, 208, 3] -> fc 7680) across bucket widths vs the fixed
35-frame volume.

Usage (real chip): python scripts/cnn3d_bucket_probe.py [--batch 8]
Reference anchor: the flatten constant, models/v_only_cnn3d.py:28 (7680).
"""

import argparse
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
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from videonavqa_tpu.models import ModelConfig, get_model
from videonavqa_tpu.train.step import make_eval_step, make_optimizer, make_train_step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--mode", type=str, default="eval",
                    choices=["eval", "train"])
    ap.add_argument("--zero_cache", action="store_true",
                    help="eval only: precompute the zero-run columns per "
                         "bucket width (state['c3d_zero'], VERDICT r4 #5) "
                         "so the in-step ~14 ms zero-run disappears")
    args = ap.parse_args()

    cfg = ModelConfig(model="v_only_cnn3d", hidden_size=128,
                      max_num_frames=35)
    spec = get_model("v_only_cnn3d")
    key = jax.random.PRNGKey(0)
    params, state = spec.init(key, cfg)
    B = args.batch

    if args.mode == "eval":
        if args.zero_cache:
            from videonavqa_tpu.models.v_only_cnn3d import (
                precompute_c3d_zero_slices,
            )

            t0 = time.time()
            zc = precompute_c3d_zero_slices(
                params, state, cfg, [32, 24, 16, 12, 8])
            jax.block_until_ready(zc)
            print(f"zero-run precompute (5 widths): {time.time() - t0:.2f}s "
                  f"(once per weights version)", flush=True)
            state = {**state, "c3d_zero": zc}
        estep = make_eval_step(spec, cfg, reduction="sum")

        def step(batch, rng):
            return estep(params, state, batch, rng)
    else:
        optimizer = make_optimizer(1e-4)
        opt_state = optimizer.init(params)
        tstep = make_train_step(spec, cfg, optimizer, reduction="sum",
                                clip_value=1.0, donate=False)

        def step(batch, rng):
            return tstep(params, state, opt_state, batch, rng)[-1]

    # one full-length clip set, zeros beyond v_len=7: every bucket slice
    # holds the SAME data, so the losses must agree across T (exactness)
    rng = np.random.RandomState(3)
    vid = rng.rand(B, 35, 160, 208, 3).astype(np.float32)
    v_len = np.full((B,), 7, np.int32)
    for b in range(B):
        vid[b, v_len[b]:] = 0.0

    results = {}
    logits_ref = {}
    for T in (35, 32, 24, 16, 12, 8):
        batch = {"video": jnp.asarray(vid[:, :T]), "v_len": jnp.asarray(v_len),
                 "label": jnp.zeros((B,), jnp.int32)}
        t0 = time.time()
        m = step(batch, jax.random.PRNGKey(1))
        float(jax.device_get(m["loss"]))
        compile_s = time.time() - t0
        t0 = time.time()
        for i in range(args.iters):
            m = step(batch, jax.random.PRNGKey(i))
        float(jax.device_get(m["loss"]))
        dt = (time.time() - t0) / args.iters
        results[T] = dt
        logits_ref[T] = float(jax.device_get(m["loss"]))
        print(f"T={T:2d}  {dt * 1e3:8.2f} ms/step ({B / dt:7.1f} videos/s)"
              f"  [compile {compile_s:.0f}s]  loss={logits_ref[T]:.4f}",
              flush=True)
    base = results[35]
    for T in (32, 24, 16, 12, 8):
        print(f"T={T:2d}: {base / results[T]:.2f}x vs fixed 35; "
              f"loss match: {abs(logits_ref[T] - logits_ref[35]) < 5e-2}",
              flush=True)


if __name__ == "__main__":
    main()
