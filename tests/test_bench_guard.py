"""bench.py regression guard: a suite run whose metrics regressed >10% vs the
committed BENCH_TAIL.json must print loud WARN lines in the judged artifact.

Round-4 incident this institutionalizes: an unmeasured fused int8 kernel in
the default serving path took the judged batch-32 line from 1004 to 639
videos/s (BENCH_r04.json line 3) with no warning anywhere in the recorded
tail. The replay below is exactly that tail against the good numbers.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


R04_TAIL_LINES = [  # BENCH_r04.json, 2026-08-20
    {"metric": "film_attn_pt_train_videos_per_sec_per_chip",
     "value": 110.38, "unit": "videos/s"},
    {"metric": "film_attn_pt_train_fcache_videos_per_sec_per_chip",
     "value": 175.55, "unit": "videos/s"},
    {"metric": "film_attn_pt_eval_fcache_videos_per_sec_per_chip",
     "value": 639.13, "unit": "videos/s"},
    {"metric": "film_attn_pt_eval_fcache_b1_ms_per_video",
     "value": 2.46, "unit": "ms"},
]


def _good_tail(tmp_path):
    p = tmp_path / "tail.json"
    p.write_text(json.dumps({"recorded": "test", "lines": [
        {"metric": "film_attn_pt_train_videos_per_sec_per_chip",
         "value": 109.7, "unit": "videos/s"},
        {"metric": "film_attn_pt_train_fcache_videos_per_sec_per_chip",
         "value": 175.7, "unit": "videos/s"},
        {"metric": "film_attn_pt_eval_fcache_videos_per_sec_per_chip",
         "value": 1004.0, "unit": "videos/s"},
        {"metric": "film_attn_pt_eval_fcache_b1_ms_per_video",
         "value": 3.5, "unit": "ms"},
    ]}))
    return str(p)


def test_guard_fires_on_r04_serving_regression(tmp_path):
    warns = bench.check_regressions(R04_TAIL_LINES, _good_tail(tmp_path))
    assert len(warns) == 1, warns
    assert "film_attn_pt_eval_fcache_videos_per_sec_per_chip" in warns[0]
    assert "639.13" in warns[0]


def test_guard_silent_on_good_run(tmp_path):
    good = [dict(l) for l in R04_TAIL_LINES]
    good[2] = {"metric": "film_attn_pt_eval_fcache_videos_per_sec_per_chip",
               "value": 1010.0, "unit": "videos/s"}
    assert bench.check_regressions(good, _good_tail(tmp_path)) == []


def test_guard_catches_latency_regression(tmp_path):
    bad = [dict(l) for l in R04_TAIL_LINES[:2]] + [
        {"metric": "film_attn_pt_eval_fcache_videos_per_sec_per_chip",
         "value": 1010.0, "unit": "videos/s"},
        {"metric": "film_attn_pt_eval_fcache_b1_ms_per_video",
         "value": 4.2, "unit": "ms"},  # 3.5 -> 4.2 is a 1.2x latency hit
    ]
    warns = bench.check_regressions(bad, _good_tail(tmp_path))
    assert len(warns) == 1 and "b1_ms_per_video" in warns[0]


def test_guard_noop_without_tail(tmp_path):
    assert bench.check_regressions(R04_TAIL_LINES,
                                   str(tmp_path / "absent.json")) == []


def test_committed_tail_parses():
    with open(bench.BENCH_TAIL) as f:
        tail = json.load(f)
    metrics = [l["metric"] for l in tail["lines"]]
    assert "film_attn_pt_eval_fcache_videos_per_sec_per_chip" in metrics
    assert all("value" in l and "unit" in l for l in tail["lines"])
