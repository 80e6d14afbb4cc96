"""HTTP load bench for the serving daemon's --feature_cache production mode.

Measures what a deployed replica sustains END TO END — HTTP parse, tokenize,
LRU feature lookup (zstd decode on miss), micro-batch collection, the jitted
int8-trunk + pallas forward, softmax top-5 JSON — at the flagship film_attn
preset (eval.sh:40-43: 5 res blocks @ 1024 channels) with closed-loop
concurrent clients. The device-side ceiling for this exact step is the
739 videos/s/chip serving bench (PERF.md); the gap to it here is host work
on this 1-core sandbox.

Usage (real chip):  python scripts/serve_load_bench.py [--clients 48]
                    [--seconds 30] [--max_batch 32]

Reference anchor: the reference has no serving path at all — its only
inference surface is the offline test harness (eval/q_and_v_test.py).
"""

import argparse
import json
import os
import sys
import threading
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BENCH_QUESTION = "what color is the table"
BENCH_VOCAB = {w: i + 1 for i, w in
               enumerate(sorted(BENCH_QUESTION.split()))}


def provision(base, feature_dtype="bfloat16"):
    """Synthetic bench dataset + vocab + feature cache + random-init ckpt."""
    import jax

    from videonavqa_tpu.cli import extract_features, serve
    from videonavqa_tpu.cli.common import load_stem
    from videonavqa_tpu.data import DataPaths, load_json
    from videonavqa_tpu.data.vnr import ensure_built
    from videonavqa_tpu.models import get_model
    from videonavqa_tpu.utils.checkpoint import save_checkpoint

    if not os.path.exists(os.path.join(base, "split.json")):
        from videonavqa_tpu.data.synthetic import generate_synthetic_dataset

        print(f"# synthesizing bench dataset in {base}", file=sys.stderr)
        generate_synthetic_dataset(base, num_houses=10, trajs_per_house=16,
                                   seed=0, max_frames=140)
    vocab_path = os.path.join(base, "vocab.json")
    if not os.path.exists(vocab_path):
        with open(vocab_path, "w") as f:
            json.dump(BENCH_VOCAB, f)

    parser = serve.build_q_and_v_parser()
    parser.add_argument("--host", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=0)
    parser.add_argument("--max_batch", type=int, default=32)
    parser.add_argument("--batch_wait_ms", type=float, default=8.0)
    parser.add_argument("--serve_split", type=str, default="test")
    parser.add_argument("--example_cache", type=int, default=64)
    ckpt = os.path.join(base, "serve_bench_ckpt.npz")
    ns = parser.parse_args([
        "--model", "film_attn_pt", "--data_dir", base,
        "--num_res_blocks", "5", "--num_res_block_channels", "1024",
        "--num_tail_channels", "64", "--checkpoint_path", ckpt,
        "--feature_cache", "true", "--use_pallas_kernels", "true",
        "--int8_trunk", "true", "--feature_dtype", feature_dtype,
        "--jax_cache_dir", os.path.join(os.path.dirname(base), ".xla_cache"),
    ])

    if not os.path.exists(ckpt):
        from videonavqa_tpu.cli.common import cfg_from_args

        spec = get_model("film_attn_pt")
        params, state = spec.init(jax.random.PRNGKey(0),
                                  cfg_from_args(ns, "film_attn_pt"))
        save_checkpoint(ckpt, params=params, state=state)

    paths = DataPaths(base)
    split_map = load_json(paths.split_file)
    ensure_built()
    if not os.path.exists(
            extract_features.feature_file(base, "test", feature_dtype)):
        print("# extracting test-split feature cache", file=sys.stderr)
        extract_features.extract_split(ns, load_stem(ns, paths), "test",
                                       split_map["test"])
    return ns, sorted(split_map["test"])


def post(port, payload, timeout):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/predict",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--clients", type=int, default=48)
    ap.add_argument("--seconds", type=float, default=30.0)
    ap.add_argument("--max_batch", type=int, default=32)
    ap.add_argument("--bucket_frames", type=lambda s: s.lower() == "true",
                    default=False,
                    help="length-bucketed micro-batches (one executable per "
                         "frame bucket)")
    ap.add_argument("--feature_dtype", type=str, default="bfloat16",
                    choices=["bfloat16", "float8_e4m3"])
    ap.add_argument("--pipeline_depth", type=int, default=2,
                    help="micro-batches in flight (serve --pipeline_depth); "
                         "1 = synchronous dispatch")
    ap.add_argument("--base", type=str,
                    default=os.path.join(os.path.dirname(os.path.dirname(
                        os.path.abspath(__file__))), ".bench_data"))
    args = ap.parse_args(argv)

    from videonavqa_tpu.cli import serve

    ns, test_ids = provision(args.base, args.feature_dtype)
    ns.max_batch = args.max_batch
    ns.bucket_frames = args.bucket_frames
    ns.pipeline_depth = args.pipeline_depth
    engine, batcher, server = serve.build_server(ns)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    port = server.server_address[1]

    t0 = time.time()
    if engine.frame_buckets:
        engine.warmup()  # precompile every bucket's executable
    post(port, {"example": test_ids[0], "question": BENCH_QUESTION},
         timeout=600)  # first request compiles the forward
    print(f"# warm request (incl. compile): {time.time() - t0:.1f}s",
          file=sys.stderr)
    for name in test_ids:  # fill the example LRU
        post(port, {"example": name, "question": BENCH_QUESTION}, timeout=600)

    with urllib.request.urlopen(f"http://127.0.0.1:{port}/stats") as r:
        s0 = json.loads(r.read())

    stop = time.time() + args.seconds
    lat, errors = [], [0]
    lock = threading.Lock()

    def client(i):
        rng_ids = test_ids[i % len(test_ids):] + test_ids[:i % len(test_ids)]
        k = 0
        while time.time() < stop:
            t = time.time()
            try:
                post(port, {"example": rng_ids[k % len(rng_ids)],
                            "question": BENCH_QUESTION}, timeout=120)
                with lock:
                    lat.append(time.time() - t)
            except Exception:
                with lock:
                    errors[0] += 1
            k += 1

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(args.clients)]
    tstart = time.time()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    dt = time.time() - tstart

    with urllib.request.urlopen(f"http://127.0.0.1:{port}/stats") as r:
        s1 = json.loads(r.read())
    server.shutdown()

    n = len(lat)
    lat.sort()
    batches = s1["batches"] - s0["batches"]
    reqs = s1["requests"] - s0["requests"]
    out = {
        "metric": "serve_http_videos_per_sec",
        "value": round(n / dt, 1),
        "unit": f"videos/s over HTTP (1 replica, flagship film_attn, "
                f"cached {args.feature_dtype} features + int8 trunk + pallas)",
        "clients": args.clients,
        "requests": n,
        "errors": errors[0],
        "p50_ms": round(lat[n // 2] * 1e3, 1) if n else None,
        "p95_ms": round(lat[int(n * 0.95)] * 1e3, 1) if n else None,
        "avg_batch": round(reqs / batches, 2) if batches else None,
        "avg_forward_ms": round((s1["forward_s"] - s0["forward_s"])
                                / batches * 1e3, 1) if batches else None,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
