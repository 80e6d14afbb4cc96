"""Task-accuracy validation of the int8 FiLM trunk on a TRAINED model.

The int8 trunk's accuracy evidence so far is logit drift on random weights
(~1.4% rel-l2, PERF.md); this trains a small film_gp_pt on a datagen
dataset and evaluates the SAME checkpoint with the bf16 trunk vs the
static-calibrated int8 trunk — the strongest validation available without
the reference's real VGG weights (the same protocol round 2 used for the
int8 stem). Reference anchor: the eval entry point whose accuracy is at
stake, eval/q_and_v_test.py:64-142.

Usage: python scripts/int8_trunk_accuracy.py [--epochs 15]
(runs anywhere; the real chip makes training fast)
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=15)
    ap.add_argument("--use_pallas", action="store_true",
                    help="run the int8 serving engine with use_pallas_kernels"
                         " (fused 1x1 + chained requant path)")
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

    results = {}
    preds = {}
    for tag, extra in (("bf16", []), ("int8", ["--int8_trunk", "true"])):
        print(f"# testing ({tag})", flush=True)
        s = q_and_v_test.main(
            [a if a != ckpt else final for a in common] + extra)
        results[tag] = s
        preds[tag] = np.asarray(s["y_pred"])

    for tag, s in results.items():
        print(f"{tag}: acc {s['hit']}/{s['num_examples']} "
              f"({s['hit'] / max(s['num_examples'], 1):.4f})  "
              f"f1_w {s['f1_w']:.4f}  loss {s['loss']:.4f}", flush=True)
    agree = float(np.mean(preds["bf16"] == preds["int8"]))
    print(f"prediction agreement int8(dynamic)-vs-bf16: {agree:.4f}",
          flush=True)
    static_agreement(args, final, common)



def static_agreement(args, final, common):
    """STATIC-calibrated int8 (the serving daemon's exact recipe: first
    micro-batch records absmax scales + prequantized kernels) vs the bf16
    engine, on identical frames + real questions: prediction agreement over
    the test split."""
    import json

    import numpy as np

    from videonavqa_tpu.cli import serve
    from videonavqa_tpu.data import DataPaths, load_json

    paths = DataPaths(args.base)
    split = load_json(paths.split_file)
    questions = {}
    qdir = os.path.join(args.base, "questions")
    for f in os.listdir(qdir):
        data = json.load(open(os.path.join(qdir, f)))
        house = f.split(".")[0]
        for tid, entry in data.items():
            questions["%s_%04d" % (house, int(tid))] = entry

    parser = serve.build_q_and_v_parser()
    parser.add_argument("--max_batch", type=int, default=16)
    # --use_pallas validates the FUSED int8 1x1 kernel's task accuracy, and
    # that kernel only serves below the measured row-count crossover
    # (models/film.py INT8_FUSED_MAX_ROWS = 9100 -> batch <= 2 at T=35), so
    # the pallas run uses the batch the fused path actually serves
    B = 2 if args.use_pallas else 16
    argv = [a if a != os.path.join(args.base, "int8acc.npz") else final
            for a in common] + ["--use_pallas_kernels", "false",
                                "--max_batch", str(B)]
    pallas = ["--use_pallas_kernels", "true"] if args.use_pallas else []
    eng_bf16 = serve.InferenceEngine(parser.parse_args(argv))
    eng_int8 = serve.InferenceEngine(
        parser.parse_args(argv + ["--int8_trunk", "true"] + pallas))

    items = []
    for name in sorted(split["test"]):
        frames, vl = eng_bf16.load_video(name + ".mp4")
        tokens = eng_bf16.encode_question(questions[name]["q_text"]) \
            if name in questions else [1]
        items.append((frames, vl, tokens))

    eng_int8.run_batch(items[:B])  # calibration batch (f32, records scales)
    pb, pi = [], []
    for i in range(0, len(items), B):
        chunk = items[i:i + B]
        pb.append(np.argmax(eng_bf16.run_batch(chunk), axis=-1))
        pi.append(np.argmax(eng_int8.run_batch(chunk), axis=-1))
    pb, pi = np.concatenate(pb), np.concatenate(pi)
    agree = float(np.mean(pb == pi))
    recipe = ("fused-pallas static-int8" if args.use_pallas
              else "STATIC-int8")
    print(f"prediction agreement {recipe}-vs-bf16 (serving recipe, "
          f"batch {B}, {len(pb)} test examples): {agree:.4f}", flush=True)

if __name__ == "__main__":
    main()
