"""Video-only test-split inference (eval/v_only_cnn3d_test.py,
eval/v_only_cnn2d_lstm_test.py)."""

from videonavqa_tpu.cli.common import run_test
from videonavqa_tpu.cli.v_only_eval import _MODEL_MAP, build_parser


def main(argv=None):
    args = build_parser().parse_args(argv)
    if not args.model:
        raise SystemExit("--model is required")
    run_test(args, _MODEL_MAP[args.model], v_only=True)


if __name__ == "__main__":
    main()
