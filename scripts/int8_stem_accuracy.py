"""Task-accuracy validation of the int8 STEM calibrations on a TRAINED model.

Round 2 measured the legacy absmax int8 stem at a real ~2-4 pt accuracy cost
(bf16 19/46 vs int8 17/46 on the then-protocol) and left the flag off by
default. Round 5 adds an improved calibration (per-input-channel
equalization + bias correction, stem/quant.py calibrate_stem_quant; feature
rel-error 2.70% -> 1.74% on the unit fixture) — this re-runs the protocol
for BOTH calibrations on the same trained checkpoint that validates the int8
trunk (scripts/int8_trunk_accuracy.py; 15-epoch film_gp_pt on a datagen
dataset, test split):

  1. bf16 stem (the reference-semantics path)
  2. int8 stem, legacy absmax calibration   (--int8_stem_calibration absmax)
  3. int8 stem, improved calibration        (--int8_stem_calibration improved)

Reference stem whose accuracy is at stake: eval/utils.py:42-51; test entry:
eval/q_and_v_test.py:64-142.

Usage: python scripts/int8_stem_accuracy.py [--epochs 15]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=15)
    ap.add_argument("--base", type=str,
                    default=os.path.join(os.path.dirname(os.path.dirname(
                        os.path.abspath(__file__))), ".acc_data"))
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(args.base), ".xla_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from videonavqa_tpu.cli import generate_dataset, q_and_v_eval, q_and_v_test
    from videonavqa_tpu.utils.checkpoint import epoch_path

    if not os.path.exists(os.path.join(args.base, "split.json")):
        print("# generating dataset", flush=True)
        generate_dataset.main(["--out", args.base, "--num_houses", "14",
                               "--trajs_per_house", "16", "--seed", "11",
                               "--workers", "2"])

    ckpt = os.path.join(args.base, "int8acc.npz")
    common = ["--model", "film_gp_pt", "--data_dir", args.base,
              "--batch_size", "16", "--num_res_blocks", "2",
              "--num_res_block_channels", "256", "--num_input_channels", "512",
              "--num_tail_channels", "32", "--embed_size", "128",
              "--hidden_size", "128", "--checkpoint_path", ckpt]
    final = epoch_path(ckpt, args.epochs - 1)
    if not os.path.exists(final):
        print("# training", flush=True)
        q_and_v_eval.main(common + ["--num_epochs", str(args.epochs)])
    common = [a if a != ckpt else final for a in common]

    runs = (("bf16-stem", []),
            ("int8-absmax", ["--int8_stem", "true",
                             "--int8_stem_calibration", "absmax"]),
            ("int8-improved", ["--int8_stem", "true",
                               "--int8_stem_calibration", "improved"]))
    results, preds = {}, {}
    for tag, extra in runs:
        print(f"# testing ({tag})", flush=True)
        s = q_and_v_test.main(common + extra)
        results[tag] = s
        preds[tag] = np.asarray(s["y_pred"])

    for tag, s in results.items():
        print(f"{tag}: acc {s['hit']}/{s['num_examples']} "
              f"({s['hit'] / max(s['num_examples'], 1):.4f})  "
              f"f1_w {s['f1_w']:.4f}  loss {s['loss']:.4f}", flush=True)
    for tag in ("int8-absmax", "int8-improved"):
        agree = float(np.mean(preds["bf16-stem"] == preds[tag]))
        print(f"prediction agreement {tag}-vs-bf16: {agree:.4f}", flush=True)


if __name__ == "__main__":
    main()
