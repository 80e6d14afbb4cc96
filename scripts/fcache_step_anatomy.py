"""Component timing for the feature-cache (trunk-only) train step at the
flagship config — updates the PERF.md step anatomy for --feature_cache.

Run on the real chip: python scripts/fcache_step_anatomy.py
All timings use host value-fetch fences (see PERF.md axon gotcha).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from videonavqa_tpu.models import ModelConfig, get_model
from videonavqa_tpu.train.step import make_optimizer, make_train_step

B, T = 32, 35


def bench(fn, args, n=8, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    float(jax.device_get(jax.tree.leaves(out)[0].ravel()[0]))
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    float(jax.device_get(jax.tree.leaves(out)[0].ravel()[0]))
    return (time.time() - t0) / n * 1000.0


def main():
    cfg = ModelConfig(model="film_attn_pt", num_res_blocks=5,
                      num_res_block_channels=1024, compute_dtype="bfloat16")
    spec = get_model("film_attn_pt")
    key = jax.random.PRNGKey(0)
    params, state = spec.init(key, cfg)
    feats = jax.random.normal(key, (B, T, 10, 13, 512), jnp.bfloat16)
    batch = {
        "v_features": feats,
        "question": jax.random.randint(key, (B, 56), 1, cfg.vocab_size),
        "v_len": jnp.full((B,), T, jnp.int32),
        "q_len": jnp.full((B,), 12, jnp.int32),
        "label": jax.random.randint(key, (B,), 0, cfg.num_classes),
    }

    @jax.jit
    def fwd(params, state, batch):
        out, _ = spec.apply(params, state, batch, cfg, train=False,
                            rng=jax.random.PRNGKey(1))
        return out

    optimizer = make_optimizer(1e-4)
    opt_state = optimizer.init(params)
    step = make_train_step(spec, cfg, optimizer, reduction="sum",
                           clip_value=1.0, donate=False)

    t_fwd = bench(fwd, (params, state, batch))
    t_step = bench(step, (params, state, opt_state, batch,
                          jax.random.PRNGKey(2)))
    print(f"flagship fcache @ T=35, batch {B}:")
    print(f"  model fwd (trunk+scans+tail): {t_fwd:.1f} ms")
    print(f"  full train step (fwd+bwd+clip+adam): {t_step:.1f} ms")
    print(f"  bwd+optimizer residue: {t_step - t_fwd:.1f} ms")


if __name__ == "__main__":
    main()
