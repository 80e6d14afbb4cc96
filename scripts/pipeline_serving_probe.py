"""Real-chip probe: pipelined serving dispatch (serve --pipeline_depth).

Measures the daemon's device step (feature-cache production mode, flagship
film_attn preset) driven back-to-back in the two dispatch disciplines the
MicroBatcher supports:

- depth 1 (synchronous): stage -> transfer -> forward -> FETCH -> repeat;
  the host sits idle during device compute and the device sits idle during
  staging + transfer.
- depth N (pipelined): stage + dispatch batch i while batch i-1's result is
  still being computed/fetched — exactly the worker/completer split in
  cli/serve.py, but driven single-threaded here so the measurement is the
  overlap itself, not GIL scheduling noise.

The delta bounds what --pipeline_depth can hide: the staging memcpy +
host->device transfer per batch. On this sandbox the tunnel transfer
dominates (~45 MB/s effective); on a PCIe host transfer is ~10 ms against a
43-65 ms device step.

Usage (real chip): python scripts/pipeline_serving_probe.py [--v_len 35]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--max_batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--depth", type=int, default=2)
    ap.add_argument("--v_len", type=int, default=35,
                    help="per-example video length (with bucketing this "
                         "selects the bucket executable)")
    ap.add_argument("--feature_dtype", type=str, default="bfloat16",
                    choices=["bfloat16", "float8_e4m3"])
    ap.add_argument("--base", type=str,
                    default=os.path.join(os.path.dirname(os.path.dirname(
                        os.path.abspath(__file__))), ".bench_data"))
    args = ap.parse_args(argv)

    from scripts.serve_load_bench import provision
    from videonavqa_tpu.cli import serve

    ns, _ = provision(args.base, args.feature_dtype)
    ns.max_batch = args.max_batch
    ns.bucket_frames = True
    engine = serve.InferenceEngine(ns)

    # two distinct frame payloads so the staging memcpy reads fresh pages
    # every batch (a single shared array would stay L2-resident)
    rng = np.random.RandomState(0)
    payloads = [
        np.abs(rng.standard_normal((35, *engine.frame_shape))).astype(
            np.float32).astype(engine.frame_dtype)
        for _ in range(3)
    ]
    tokens = [1, 2, 3, 4]
    batches = [[(p, args.v_len, tokens)] * args.max_batch for p in payloads]

    def fetch(handle):
        probs, n, fetched = handle
        return probs if fetched else np.asarray(probs)[:n]

    # warm every executable + calibrate int8 before timing
    fetch(engine.dispatch_batch(batches[0]))
    fetch(engine.dispatch_batch(batches[0]))

    def run_sync(iters):
        t0 = time.time()
        for i in range(iters):
            fetch(engine.dispatch_batch(batches[i % len(batches)]))
        return (time.time() - t0) / iters

    def run_pipelined(iters, depth):
        window = []
        t0 = time.time()
        for i in range(iters):
            window.append(engine.dispatch_batch(batches[i % len(batches)]))
            if len(window) >= depth:
                fetch(window.pop(0))
        while window:
            fetch(window.pop(0))
        return (time.time() - t0) / iters

    sync = run_sync(args.iters)
    piped = run_pipelined(args.iters, args.depth)
    sync2 = run_sync(args.iters)  # order control: re-measure sync after

    B = args.max_batch
    print(f"v_len={args.v_len} feature_dtype={args.feature_dtype} "
          f"batch={B} iters={args.iters}")
    print(f"  depth 1 (sync):      {sync * 1e3:8.2f} ms/batch "
          f"({B / sync:7.1f} videos/s)  [re-run {sync2 * 1e3:.2f} ms]")
    print(f"  depth {args.depth} (pipelined): {piped * 1e3:8.2f} ms/batch "
          f"({B / piped:7.1f} videos/s)")
    print(f"  overlap win: {min(sync, sync2) / piped:.3f}x")


if __name__ == "__main__":
    main()
