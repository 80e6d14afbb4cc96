"""Question-only test-split inference (eval/q_only_test.py)."""

from videonavqa_tpu.cli.common import run_test
from videonavqa_tpu.cli.q_only_eval import build_parser


def main(argv=None):
    args = build_parser().parse_args(argv)
    if not args.model:
        raise SystemExit("--model is required")
    run_test(args, args.model, q_only=True)


if __name__ == "__main__":
    main()
