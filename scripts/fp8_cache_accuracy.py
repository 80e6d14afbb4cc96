"""Task-accuracy validation of the fp8 feature cache on a TRAINED model.

The fp8 cache's accuracy evidence so far is logit drift on random weights
(0.32% rel-l2, scripts/fp8_cache_parity.py); VERDICT r4 #6 asks for the same
trained-checkpoint treatment the int8 trunk got. This reuses the checkpoint
trained by scripts/int8_trunk_accuracy.py (same 15-epoch film_gp_pt protocol
on a datagen dataset) and evaluates it three ways on the test split:

  1. online bf16 stem (no cache)            — the reference-semantics path
  2. bf16 feature cache                     — exact stem outputs, cached
  3. fp8 (float8_e4m3) feature cache        — DEPLOYMENT.md's production
                                              storage recommendation

and reports accuracy / weighted-F1 / loss / prediction agreement for each.
Reference anchor: the feature tensor being stored is the frozen detector
output, /root/reference/models/obj_detector.py:85-86; the accuracy at stake
is the test entry, /root/reference/eval/q_and_v_test.py:64-142.

Usage: python scripts/fp8_cache_accuracy.py
(run scripts/int8_trunk_accuracy.py first, or this trains the checkpoint)
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

    runs = (("online-bf16", []),
            ("bf16-cache", ["--feature_cache", "true"]),
            ("fp8-cache", ["--feature_cache", "true",
                           "--feature_dtype", "float8_e4m3"]))
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
    for tag in ("bf16-cache", "fp8-cache"):
        agree = float(np.mean(preds["online-bf16"] == preds[tag]))
        print(f"prediction agreement {tag}-vs-online-bf16: {agree:.4f}",
              flush=True)
    # the isolating comparison: fp8 storage vs the identical bf16-cached
    # pipeline (any online-vs-cache delta is the cache seam, not fp8)
    agree = float(np.mean(preds["bf16-cache"] == preds["fp8-cache"]))
    print(f"prediction agreement fp8-cache-vs-bf16-cache: {agree:.4f}",
          flush=True)


if __name__ == "__main__":
    main()
