"""Multi-process HTTP load bench for the serving daemon.

The single-process load bench (scripts/serve_load_bench.py) is GIL-bound:
48 client threads share the server's interpreter, so every config measures
the GIL (~6-10 videos/s), not the daemon. Here the clients are SEPARATE
PROCESSES (pure-stdlib workers — no jax import, ~20 MB each), so the server
process keeps its whole interpreter for HTTP parse + staging + dispatch.

Reports BOTH sides so the bottleneck is attributable:
  - http_videos_per_sec: client-observed completions/s over real sockets;
  - server_device_videos_per_sec: Δrequests/Δforward_s from /stats, i.e.
    dequeue -> settle throughput of the micro-batcher under this socket load
    (the daemon's capacity if HTTP ingest were free);
  - avg_batch: micro-batch fill — near max_batch means the server is
    device-bound; small fill means it is request-starved (client-bound).

On this 1-core sandbox client processes still steal cycles from the server,
so http_videos_per_sec remains a lower bound; the server-side pair is the
production-relevant measurement. Reference anchor: the inference entry point
being served, /root/reference/eval/q_and_v_test.py:64-142.

Usage (real chip):
  python scripts/serve_mp_load_bench.py [--procs 4] [--threads 12]
                                        [--seconds 30] [--pipeline_depth 2]
Worker mode (internal): --worker --port P --seconds S --threads K --ids FILE
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile
import threading
import time
import urllib.request

BENCH_QUESTION = "what color is the table"


def post(port, payload, timeout):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/predict",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


def worker_main(args):
    """Pure-stdlib closed-loop client: K threads hammering /predict until the
    deadline, then one JSON result line on stdout."""
    with open(args.ids) as f:
        ids = json.load(f)
    stop = time.time() + args.seconds
    lat, errors = [], [0]
    lock = threading.Lock()

    def client(i):
        my = ids[i % len(ids):] + ids[:i % len(ids)]
        k = 0
        while time.time() < stop:
            t = time.time()
            try:
                post(args.port, {"example": my[k % len(my)],
                                 "question": BENCH_QUESTION}, timeout=120)
                with lock:
                    lat.append(time.time() - t)
            except Exception:
                with lock:
                    errors[0] += 1
            k += 1

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(args.threads)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    lat.sort()
    n = len(lat)
    print(json.dumps({
        "count": n, "errors": errors[0],
        "p50": lat[n // 2] if n else None,
        "p95": lat[int(n * 0.95)] if n else None,
    }))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--port", type=int, default=0)
    ap.add_argument("--ids", type=str, default="")
    ap.add_argument("--procs", type=int, default=4)
    ap.add_argument("--threads", type=int, default=12)
    ap.add_argument("--seconds", type=float, default=30.0)
    ap.add_argument("--max_batch", type=int, default=32)
    ap.add_argument("--bucket_frames", type=lambda s: s.lower() == "true",
                    default=True)
    ap.add_argument("--pipeline_depth", type=int, default=2)
    ap.add_argument("--feature_dtype", type=str, default="bfloat16",
                    choices=["bfloat16", "float8_e4m3"])
    ap.add_argument("--base", type=str,
                    default=os.path.join(os.path.dirname(os.path.dirname(
                        os.path.abspath(__file__))), ".bench_data"))
    args = ap.parse_args(argv)

    if args.worker:
        worker_main(args)
        return

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from scripts.serve_load_bench import provision
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
        engine.warmup()
    post(port, {"example": test_ids[0], "question": BENCH_QUESTION},
         timeout=600)
    print(f"# warm request (incl. compile): {time.time() - t0:.1f}s",
          file=sys.stderr)
    for name in test_ids:  # fill the example LRU
        post(port, {"example": name, "question": BENCH_QUESTION}, timeout=600)

    with urllib.request.urlopen(f"http://127.0.0.1:{port}/stats") as r:
        s0 = json.loads(r.read())

    ids_file = os.path.join(tempfile.mkdtemp(prefix="mplg_"), "ids.json")
    with open(ids_file, "w") as f:
        json.dump(test_ids, f)
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # workers are stdlib-only; keep them light
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--worker",
         "--port", str(port), "--ids", ids_file,
         "--seconds", str(args.seconds), "--threads", str(args.threads)],
        stdout=subprocess.PIPE, env=env, text=True)
        for _ in range(args.procs)]
    tstart = time.time()
    results = [json.loads(p.communicate()[0]) for p in procs]
    dt = time.time() - tstart

    with urllib.request.urlopen(f"http://127.0.0.1:{port}/stats") as r:
        s1 = json.loads(r.read())
    server.shutdown()

    n = sum(r["count"] for r in results)
    errors = sum(r["errors"] for r in results)
    batches = s1["batches"] - s0["batches"]
    reqs = s1["requests"] - s0["requests"]
    fwd_s = s1["forward_s"] - s0["forward_s"]
    out = {
        "metric": "serve_http_mp_videos_per_sec",
        "value": round(n / dt, 1),
        "unit": f"videos/s over HTTP ({args.procs} client procs x "
                f"{args.threads} threads, flagship film_attn, cached "
                f"{args.feature_dtype} features + int8 trunk + pallas, "
                f"buckets={args.bucket_frames} depth={args.pipeline_depth})",
        "requests": n,
        "errors": errors,
        "p50_ms": round(max(r["p50"] or 0 for r in results) * 1e3, 1),
        "p95_ms": round(max(r["p95"] or 0 for r in results) * 1e3, 1),
        "avg_batch": round(reqs / batches, 2) if batches else None,
        "server_device_videos_per_sec": (round(reqs / fwd_s, 1)
                                         if fwd_s > 0 else None),
        "server_forward_ms_per_batch": (round(fwd_s / batches * 1e3, 1)
                                        if batches else None),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
