"""The driver-facing bench entry point (bench.py): the JSON contract and the
eval/int8 static-calibration path, at toy dims on the CPU mesh."""

import json

import pytest


def _run(capsys, argv):
    import bench

    bench.main(argv)
    out = capsys.readouterr().out.strip().splitlines()
    payload = json.loads(out[-1])
    assert payload["unit"] == "videos/s"
    assert payload["value"] > 0
    assert payload["vs_baseline"] > 0
    return payload


TINY = ["--feature_cache", "true", "--num_res_blocks", "1",
        "--num_res_block_channels", "16", "--num_tail_channels", "4",
        "--batch_size", "4", "--steps", "2", "--warmup", "1"]


def test_bench_train_json_contract(capsys):
    p = _run(capsys, ["--mode", "train"] + TINY)
    assert p["metric"] == "film_attn_pt_train_fcache_videos_per_sec_per_chip"


def test_bench_eval_int8_static_calibration(capsys):
    """eval + --int8_trunk runs the f32 calibration forward first, then the
    timed static-int8 steps (the serving headline recipe)."""
    p = _run(capsys, ["--mode", "eval", "--int8_trunk", "true"] + TINY)
    assert p["metric"] == "film_attn_pt_eval_fcache_videos_per_sec_per_chip"


def test_bench_batch1_ms_contract(capsys):
    """--report ms_per_video emits the batch-1 serving latency line the
    driver suite records (bench.run_suite line 4)."""
    import bench

    # later --batch_size wins over TINY's (argparse last-occurrence)
    bench.main(["--mode", "eval", "--report", "ms_per_video"] + TINY
               + ["--batch_size", "1"])
    out = capsys.readouterr().out.strip().splitlines()
    payload = json.loads(out[-1])
    assert payload["metric"] == "film_attn_pt_eval_fcache_b1_ms_per_video"
    assert payload["unit"] == "ms"
    assert payload["value"] > 0 and payload["vs_baseline"] > 0
