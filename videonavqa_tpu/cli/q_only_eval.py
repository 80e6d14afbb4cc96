"""Question-only train/val harness (eval/q_only_eval.py).

Validates every --stats_after_every epochs and keeps the best-val-accuracy
checkpoint (the reference's intent at eval/q_only_eval.py:213-223; its
committed version crashes on a `test` NameError — SURVEY §8.4).
"""

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from videonavqa_tpu.cli.common import Harness, add_common_args
from videonavqa_tpu.data import BatchLoader
from videonavqa_tpu.train.step import make_eval_step, make_optimizer, make_train_step
from videonavqa_tpu.utils import checkpoint as ckpt


def build_parser():
    parser = argparse.ArgumentParser()
    add_common_args(parser)
    parser.add_argument("--embed_size", type=int, default=128)
    parser.add_argument("--hidden_size", type=int, default=128)
    parser.add_argument("--model", type=str, choices=["lstm", "bow"])
    parser.add_argument("--batch_size", type=int, default=1024)
    parser.add_argument("--l_rate", type=float, default=1e-5)
    parser.add_argument("--num_epochs", type=int, default=1000)
    parser.add_argument("--stats_after_every", type=int, default=50)
    parser.add_argument("--use_class_weights", type=lambda s: s.lower() == "true", default=True)
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)
    if not args.model:
        raise SystemExit("--model is required")
    h = Harness(args, args.model, q_only=True)
    train_ds = h.dataset("train")
    val_ds = h.dataset("val", deterministic=True)
    print("%d train examples, %d validation examples" % (len(train_ds), len(val_ds)))

    if args.use_class_weights:
        # stays host-side numpy; jit embeds it as a constant (device round-trips
        # through the axon tunnel are pathologically slow for eager transfers)
        h.class_weights = train_ds.get_class_weights(h.cfg.num_classes)
        print("Using class weights", h.class_weights)

    train_loader = BatchLoader(train_ds, args.batch_size, shuffle=True,
                               num_workers=args.num_workers, seed=args.seed)
    val_loader = BatchLoader(val_ds, args.batch_size, shuffle=False, mode="val",
                             num_workers=args.num_workers, seed=args.seed)

    params, state = h.init_model()
    optimizer = make_optimizer(args.l_rate)
    opt_state = optimizer.init(params)
    params, state, opt_state = h.shard_model(params, state, opt_state)
    # q_only applies no gradient clipping (eval/q_only_eval.py:92-94)
    train_step = make_train_step(h.spec, h.cfg, optimizer,
                                 class_weights=h.class_weights, reduction="mean")
    eval_step = make_eval_step(h.spec, h.cfg, class_weights=h.class_weights,
                               reduction="mean")

    rng = jax.random.PRNGKey(args.seed + 1)
    best_acc = -1.0  # first validation always checkpoints (the reference's 0 start
    # never saves an all-zero-accuracy model, eval/q_only_eval.py:213)
    for epoch in range(args.num_epochs):
        params, state, opt_state, summary, rng = h.run_epoch(
            train_step, params, state, opt_state, train_loader, epoch,
            train=True, rng=rng)
        if (epoch + 1) % args.stats_after_every == 0:
            print("Train Epoch: {}\tAverage loss: {:.6f}\tF1: w{:.4f}, micro{:.4f}".format(
                epoch + 1, summary["loss"], summary["f1_w"], summary["f1_micro"]))
            _, _, _, vs, rng = h.run_epoch(
                eval_step, params, state, opt_state, val_loader, epoch,
                train=False, rng=rng)
            print("Validation:\tAverage loss: {:.6f}, F1: w{:.4f}, micro{:.4f}".format(
                vs["loss"], vs["f1_w"], vs["f1_micro"]))
            if vs["f1_micro"] > best_acc and args.checkpoint_path:
                best_acc = vs["f1_micro"]  # global metric: same on every host
                if jax.process_index() == 0:
                    ckpt.save_checkpoint(
                        args.checkpoint_path, params=params, state=state,
                        opt_state=opt_state,
                        meta={"epoch": epoch, "model": args.model, "val_acc": best_acc})


if __name__ == "__main__":
    main()
