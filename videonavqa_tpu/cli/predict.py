"""Single-example inference: video file + question text -> answer string.

A serving-style surface the reference lacks: loads a trained checkpoint (and
the frozen stem), tokenizes the raw question against the dataset vocabulary,
decodes/subsamples the video, and prints the predicted answer class.

    python -m videonavqa_tpu.cli.predict --model film_attn_pt \
        --checkpoint_path e0_film.ckpt --data_dir /path/to/data \
        --video /path/to/videos/house_0001.mp4 \
        --question "Is there a blue table in the kitchen?"
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from videonavqa_tpu.cli.common import build_q_and_v_parser, cfg_from_args, load_stem
from videonavqa_tpu.data import DataPaths, load_json
from videonavqa_tpu.data.pipeline import _decode_video, subsample_frames
from videonavqa_tpu.datagen.encode import tokenize
from videonavqa_tpu.datagen.ontology import ANSWER_VOCAB
from videonavqa_tpu.models import get_model
from videonavqa_tpu.utils import checkpoint as ckpt
from videonavqa_tpu.utils import constants as C

CLASS_TO_ANSWER = {v: k for k, v in ANSWER_VOCAB.items()}


def main(argv=None):
    parser = build_q_and_v_parser()
    parser.add_argument("--video", type=str, required=True,
                        help="path to an .mp4/.npy video (extension optional)")
    parser.add_argument("--question", type=str, required=True)
    # --use_pallas_kernels comes from the shared parser; here (single-example
    # serving) None auto-resolves to ON for TPU backends — measured 2.0x
    # batch-1 serving on v5e (PERF.md); OFF elsewhere (no CPU lowering).
    args = parser.parse_args(argv)
    if not args.model:
        raise SystemExit("--model is required")
    if not args.checkpoint_path or not os.path.exists(args.checkpoint_path):
        raise SystemExit("--checkpoint_path is required for inference")

    paths = DataPaths(args.data_dir)
    vocab_path = os.path.join(args.data_dir, "vocab.json")
    if not os.path.exists(vocab_path):
        raise SystemExit(f"no vocab.json in {args.data_dir} "
                         "(written by cli.generate_dataset / datagen.encode)")
    vocab = load_json(vocab_path)

    tokens = []
    for tok in tokenize(args.question):
        if tok not in vocab:
            raise SystemExit(f"token {tok!r} not in the dataset vocabulary")
        tokens.append(vocab[tok])
    q = np.zeros(C.MAX_Q_LEN, dtype=np.int32)
    q[: len(tokens)] = tokens[: C.MAX_Q_LEN]

    video_base = args.video
    for ext in (".mp4", ".npy"):
        if video_base.endswith(ext):
            video_base = video_base[: -len(ext)]
    raw = _decode_video(video_base)
    frames, v_len = subsample_frames(raw, np.random.RandomState(args.seed))

    cfg = cfg_from_args(args, args.model)
    use_pallas = args.use_pallas_kernels
    if use_pallas is None:  # serving default: on for TPU backends only
        use_pallas = jax.default_backend() not in ("cpu",)
    if use_pallas:
        import dataclasses

        cfg = dataclasses.replace(cfg, use_pallas_kernels=True)
    spec = get_model(args.model)
    params, state = spec.init(jax.random.PRNGKey(args.seed), cfg)
    params, state_r, _, _ = ckpt.load_any_checkpoint(
        args.checkpoint_path, model_name=args.model, cfg=cfg,
        params_template=params, state_template=state)
    # load_checkpoint returns host numpy arrays; pin them on device once
    params = jax.device_put(params)
    state = jax.device_put(state_r if state_r is not None else state)

    batch = {
        "question": jnp.asarray(q)[None],
        "q_len": jnp.asarray([max(len(tokens), 1)], jnp.int32),
        "v_len": jnp.asarray([v_len], jnp.int32),
    }
    video = jnp.asarray(frames)[None].astype(jnp.float32) / 255.0
    if spec.uses_stem:
        stem_fn = load_stem(args, paths)
        batch["v_features"] = stem_fn(video)
    else:
        batch["video"] = video

    logits, _ = jax.jit(
        lambda p, s, b: spec.apply(p, s, b, cfg, train=False,
                                   rng=jax.random.PRNGKey(0)))(params, state, batch)
    probs = jax.nn.softmax(logits[0])
    top = np.asarray(jnp.argsort(-probs)[:5])
    print("Answer:", CLASS_TO_ANSWER[int(top[0])])
    for i in top:
        print(f"  {CLASS_TO_ANSWER[int(i)]:>40s}  {float(probs[i]):.4f}")


if __name__ == "__main__":
    main()
