"""Export a framework checkpoint to the reference's PyTorch format.

Completes the interchange loop: `utils/zoo_import` brings reference torch
checkpoints in; this CLI writes models trained HERE back out as the exact
torch.save layout the reference harness resumes/evaluates from
({'epoch', 'model', 'state_dict'}, eval/q_and_v_eval.py:148-156), with
reference layer names and OIHW conv kernels.

    python -m videonavqa_tpu.cli.export_checkpoint --model film_attn_pt \
        --checkpoint_path e3_at.ckpt --out at_sum_1e-4.pt \
        [model-dimension flags as used in training]

The FiLM-family conv1x1 skip weights are dropped, as in every real
reference checkpoint (plain-list layers outside state_dict, SURVEY §8.9);
use the framework's npz checkpoints for full-fidelity round trips.
"""

from __future__ import annotations

import os

import jax

from videonavqa_tpu.cli.common import build_q_and_v_parser, cfg_from_args
from videonavqa_tpu.models import get_model
from videonavqa_tpu.utils import checkpoint as ckpt
from videonavqa_tpu.utils.zoo_export import save_reference_checkpoint


ZOO = ["bow", "lstm", "v_only_cnn3d", "v_only_cnn2d_lstm", "concat2d",
       "concat3d", "film_gp_pt", "film_attn_pt", "time_multi_hop", "mac"]


def main(argv=None):
    parser = build_q_and_v_parser()
    parser.add_argument("--out", type=str, required=True,
                        help="output .pt path (reference torch format)")
    # exports cover the full zoo, not just the q_and_v harness's models
    for action in parser._actions:
        if action.dest == "model":
            action.choices = ZOO
    args = parser.parse_args(argv)
    if not args.model:
        raise SystemExit("--model is required")
    if not args.checkpoint_path or not os.path.exists(args.checkpoint_path):
        raise SystemExit("--checkpoint_path must point at a framework "
                         "checkpoint (.npz)")

    cfg = cfg_from_args(args, args.model)
    spec = get_model(args.model)
    params, state = spec.init(jax.random.PRNGKey(args.seed), cfg)
    params, state_r, _, meta = ckpt.load_checkpoint(
        args.checkpoint_path, params_template=params, state_template=state)
    state = state_r if state_r is not None else state
    epoch = int(meta.get("epoch", 0))
    save_reference_checkpoint(args.out, args.model, params, state, cfg,
                              epoch=epoch)
    print(f"=> Exported {args.model} (epoch {epoch}) to {args.out}")


if __name__ == "__main__":
    main()
