"""Train/val harness for the question+video model zoo.

TPU counterpart of eval/q_and_v_eval.py — same flags, presets and checkpoint
semantics. Usage:

    python -m videonavqa_tpu.cli.q_and_v_eval --model film_attn_pt \
        --data_dir /path/to/data --batch_size 32 --l_rate 1e-4 \
        --num_res_blocks 5 --num_res_block_channels 1024 --loss_reduction sum \
        --checkpoint_path film_attn.ckpt
"""

from videonavqa_tpu.cli.common import build_q_and_v_parser, run_training


def main(argv=None):
    args = build_q_and_v_parser().parse_args(argv)
    if not args.model:
        raise SystemExit("--model is required")
    run_training(args, args.model, clip_value=args.clip_value)


if __name__ == "__main__":
    main()
