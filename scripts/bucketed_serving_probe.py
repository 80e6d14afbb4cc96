"""Real-chip probe: bucketed frame trimming in the serving daemon.

Measures InferenceEngine.run_batch (the daemon's device step, feature-cache
production mode: int8 trunk + pallas, flagship film_attn preset) at each
frame-bucket length vs the fixed 35-frame shape, with fenced timing. The win
is linear in trimmed frames — the trunk is the roofline FLOPs and every
frame is independent until the attention tail.

Usage (real chip): python scripts/bucketed_serving_probe.py [--max_batch 32]
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
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--feature_dtype", type=str, default="bfloat16",
                    choices=["bfloat16", "float8_e4m3"])
    ap.add_argument("--base", type=str,
                    default=os.path.join(os.path.dirname(os.path.dirname(
                        os.path.abspath(__file__))), ".bench_data"))
    args = ap.parse_args(argv)

    import jax

    from scripts.serve_load_bench import provision
    from videonavqa_tpu.cli import serve

    ns, test_ids = provision(args.base, args.feature_dtype)
    ns.max_batch = args.max_batch
    ns.bucket_frames = True
    engine = serve.InferenceEngine(ns)
    assert engine.frame_buckets is not None

    frames = np.zeros((35, *engine.frame_shape), engine.frame_dtype)
    tokens = [1, 2, 3, 4]

    def timed(v_len, n_iters):
        items = [(frames, v_len, tokens)] * args.max_batch
        engine.run_batch(items)  # compile + warm
        t0 = time.time()
        for _ in range(n_iters):
            p = engine.run_batch(items)
        float(p.sum())  # fence: run_batch already device_gets via np.asarray
        return (time.time() - t0) / n_iters

    results = {}
    for t_b in list(engine.frame_buckets):
        # v_len == bucket edge => exactly this bucket's executable
        dt = timed(t_b, args.iters)
        results[t_b] = dt
        vps = args.max_batch / dt
        print(f"bucket {t_b:>2} frames: {dt * 1e3:7.2f} ms/batch "
              f"({vps:6.1f} videos/s)", flush=True)

    full = results[35]
    print("\nvs the fixed 35-frame shape:")
    for t_b, dt in results.items():
        print(f"  {t_b:>2} frames: {full / dt:4.2f}x")

    # realistic mix: the bench set's length distribution, one batch per bucket
    lens = engine.feature_loader._lengths[:128]
    if len(lens):
        import collections

        picks = collections.Counter(
            min((t for t in engine.frame_buckets if t >= (int(l) + 3) // 4),
                default=35) for l in lens)
        tot_t = sum(results[b] * c for b, c in picks.items())
        tot_full = full * sum(picks.values())
        n_videos = args.max_batch * sum(picks.values())
        print(f"\nlength-weighted over {sum(picks.values())} batches "
              f"({dict(sorted(picks.items()))}):")
        print(f"  bucketed {n_videos / tot_t:6.1f} videos/s "
              f"vs fixed-35 {n_videos / tot_full:6.1f} "
              f"({tot_full / tot_t:4.2f}x)")


if __name__ == "__main__":
    main()
