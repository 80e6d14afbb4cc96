"""Test-split inference for the question+video models (eval/q_and_v_test.py).

Pads the final partial batch, restores a required checkpoint, prints per-class
accuracies + F1, and dumps t_/p_/q_<ckpt>.npy for results_analysis.
"""

from videonavqa_tpu.cli.common import build_q_and_v_parser, run_test


def main(argv=None):
    args = build_q_and_v_parser().parse_args(argv)
    if not args.model:
        raise SystemExit("--model is required")
    return run_test(args, args.model)


if __name__ == "__main__":
    main()
