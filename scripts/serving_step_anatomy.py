"""Component timing for the SERVING eval step (pallas + static int8 trunk,
cached features) at the flagship config — where do batch-32's ~36 ms and
batch-1's ~4 ms go, vs the int8 conv roofline (~27 ms / ~1.3 ms at T=35)?

Components timed in isolation (each its own jit, same shapes as the step):
  1. full eval forward (the bench metric-3/4 inner step)
  2. FiLM question re-encode (kernels/film_reencode_pallas: T*56 = 1960
     sequential cell steps — batch-count independent)
  3. int8 trunk alone (prequant kernels + static scales, films fixed)
  4. attention tail alone (kernels/attn_tail_pallas: 35 sequential steps)
  5. fc_embed_attn projection (the [B*T, 133120] x [133120, 128] matmul)

Run on the real chip: python scripts/serving_step_anatomy.py
All timings use host value-fetch fences (see PERF.md axon gotcha).
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      ".xla_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from videonavqa_tpu.models import ModelConfig, get_model
from videonavqa_tpu.models.film import film_trunk, film_values_over_frames
from videonavqa_tpu.kernels.attn_tail_pallas import attn_tail_pallas
from videonavqa_tpu.ops.linear import linear
from videonavqa_tpu.ops.masking import attn_frame_mask, length_mask
from videonavqa_tpu.train.step import _forward

T = 35


def bench(fn, args, n=30, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    float(jax.device_get(jax.tree.leaves(out)[0].ravel()[0]))
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    float(jax.device_get(jax.tree.leaves(out)[0].ravel()[0]))
    return (time.time() - t0) / n * 1000.0


def run(B):
    cfg = ModelConfig(model="film_attn_pt", num_res_blocks=5,
                      num_res_block_channels=1024, compute_dtype="bfloat16",
                      use_pallas_kernels=True, use_int8_trunk=True)
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

    # static int8 calibration (the serving daemon's startup path)
    cal_cfg = dataclasses.replace(cfg, int8_trunk_calibrate=True)
    _, state = jax.jit(lambda p, s, b: _forward(
        spec, cal_cfg, p, s, b, jax.random.PRNGKey(2), train=False))(
            params, state, batch)

    @jax.jit
    def full(params, state, batch):
        out, _ = spec.apply(params, state, batch, cfg, train=False,
                            rng=jax.random.PRNGKey(1))
        return out

    @jax.jit
    def reencode(params, q, q_lens):
        return film_values_over_frames(params, q, q_lens, T, cfg,
                                       padding_idx=None, use_pallas=True)

    films = reencode(params, batch["question"], batch["q_len"])
    frame_mask = length_mask(batch["v_len"], T)

    @jax.jit
    def trunk(params, state, feats, films):
        x, _ = film_trunk(params["trunk"], state["trunk"], feats, films,
                          frame_mask, cfg, train=False)
        return x

    x = trunk(params, state, feats, films)

    from videonavqa_tpu.ops.linear import linear_chw

    @jax.jit
    def embed_proj(params, x):
        return linear_chw(params["fc_embed_attn"], x)

    all_features = embed_proj(params, x)
    scores = linear(params["fc_attn_1"], all_features)[..., 0]
    mask = attn_frame_mask(batch["v_len"], T)

    @jax.jit
    def tail(params, all_features, scores, mask):
        return attn_tail_pallas(params, all_features, scores, mask,
                                num_steps=cfg.max_num_frames, n_phantom=0.0)

    t_full = bench(full, (params, state, batch))
    t_re = bench(reencode, (params, batch["question"], batch["q_len"]))
    t_tr = bench(trunk, (params, state, feats, films))
    t_em = bench(embed_proj, (params, x))
    t_ta = bench(tail, (params, all_features, scores, mask))

    print(f"\nB={B}, T={T} (pallas + static int8 prequant, cached features):")
    print(f"  full eval fwd:        {t_full:7.2f} ms")
    print(f"  re-encode kernel:     {t_re:7.2f} ms  (1960 seq cell steps)")
    print(f"  int8 trunk:           {t_tr:7.2f} ms  (roofline ~{0.0148*B*T/394*1000:.1f} ms int8)")
    print(f"  fc_embed_attn matmul: {t_em:7.2f} ms")
    print(f"  attn tail kernel:     {t_ta:7.2f} ms  (35 seq steps)")
    print(f"  residue (BN/relu/out): {t_full - t_re - t_tr - t_em - t_ta:6.2f} ms")


if __name__ == "__main__":
    for B in (1, 32):
        run(B)
