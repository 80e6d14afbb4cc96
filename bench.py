"""Benchmark: FiLM-attention training throughput (videos/sec/chip).

Runs the eval.sh film_attn_pt preset (eval.sh:36-40: batch 32, 5 res blocks @
1024 channels, at_hidden 128, loss reduction sum) as the full on-device
training step — frozen VGG-16+ObjDetectCNN stem, FiLM trunk, attention tail,
CE-sum loss, backward, global-norm clip, Adam — on synthetic device-resident
inputs, and reports steady-state videos/sec on one chip.

Baseline: the reference trains this model on a P100 at "a few hours" per epoch
(README.md:42). With the VideoNavQA train split (~86k examples, arXiv:1908.04950)
and 3 h/epoch that is ~8 videos/sec; vs_baseline is measured against that
estimate.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp

from videonavqa_tpu.models import ModelConfig, get_model
from videonavqa_tpu.stem import init_obj_detector, init_vgg_partial, stem_features
from videonavqa_tpu.train.step import make_optimizer, make_train_step

P100_VIDEOS_PER_SEC = 8.0  # ~86k examples / 3h (README.md:42)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--steps", type=int, default=10)
    parser.add_argument("--warmup", type=int, default=2)
    parser.add_argument("--model", type=str, default="film_attn_pt")
    parser.add_argument("--num_res_blocks", type=int, default=5)
    parser.add_argument("--num_res_block_channels", type=int, default=1024)
    args = parser.parse_args(argv)

    cfg = ModelConfig(model=args.model, num_res_blocks=args.num_res_blocks,
                      num_res_block_channels=args.num_res_block_channels)
    spec = get_model(cfg.model)
    key = jax.random.PRNGKey(0)

    params, state = spec.init(key, cfg)
    vgg_params = init_vgg_partial(key)
    det_params, det_state = init_obj_detector(key)

    def stem_fn(video):
        return stem_features(vgg_params, det_params, det_state, video)

    optimizer = make_optimizer(1e-4)
    opt_state = optimizer.init(params)
    step = make_train_step(spec, cfg, optimizer, reduction="sum", clip_value=1.0,
                           stem_fn=stem_fn)

    B = args.batch_size
    kv, kq = jax.random.split(key)
    batch = {
        "video": jax.random.uniform(kv, (B, 35, 160, 208, 3), jnp.float32),
        "question": jax.random.randint(kq, (B, 56), 1, cfg.vocab_size),
        "v_len": jnp.concatenate([jnp.full((B // 2,), 35), jnp.full((B - B // 2,), 18)]).astype(jnp.int32),
        "q_len": jnp.full((B,), 12, jnp.int32),
        "label": jax.random.randint(key, (B,), 0, cfg.num_classes),
    }

    rng = jax.random.PRNGKey(1)
    for i in range(args.warmup):
        rng, sub = jax.random.split(rng)
        params, state, opt_state, metrics = step(params, state, opt_state, batch, sub)
    jax.block_until_ready(metrics["loss"])

    t0 = time.time()
    for i in range(args.steps):
        rng, sub = jax.random.split(rng)
        params, state, opt_state, metrics = step(params, state, opt_state, batch, sub)
    jax.block_until_ready(metrics["loss"])
    dt = time.time() - t0

    videos_per_sec = args.steps * B / dt
    print(json.dumps({
        "metric": "film_attn_train_videos_per_sec_per_chip",
        "value": round(videos_per_sec, 2),
        "unit": "videos/s",
        "vs_baseline": round(videos_per_sec / P100_VIDEOS_PER_SEC, 2),
    }))
    print(f"# {dt / args.steps * 1000:.1f} ms/step at batch {B}, "
          f"loss={float(metrics['loss']):.3f}", file=sys.stderr)


if __name__ == "__main__":
    main()
