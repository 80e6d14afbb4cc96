"""Batch-serving daemon (cli/serve.py): HTTP surface + micro-batching."""

import json
import os
import threading
import urllib.request

import numpy as np
import pytest

import jax


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    """A live server over a generated dataset + 1-epoch checkpoint."""
    from videonavqa_tpu.cli import generate_dataset, q_and_v_eval, serve
    from videonavqa_tpu.utils.checkpoint import epoch_path

    base = str(tmp_path_factory.mktemp("servegen"))
    generate_dataset.main(["--out", base, "--num_houses", "2",
                           "--trajs_per_house", "2", "--seed", "5"])
    ckpt = os.path.join(base, "serve_ckpt.npz")
    common = ["--model", "film_gp_pt", "--data_dir", base,
              "--batch_size", "2", "--num_res_blocks", "1",
              "--num_res_block_channels", "16", "--num_input_channels", "512",
              "--num_tail_channels", "4", "--embed_size", "8",
              "--hidden_size", "8", "--compute_dtype", "float32"]
    q_and_v_eval.main(common + ["--num_epochs", "1", "--checkpoint_path", ckpt])

    args = serve.build_q_and_v_parser()
    args.add_argument("--host", type=str, default="127.0.0.1")
    args.add_argument("--port", type=int, default=0)
    args.add_argument("--max_batch", type=int, default=4)
    args.add_argument("--batch_wait_ms", type=float, default=150.0)
    ns = args.parse_args(common + ["--checkpoint_path", epoch_path(ckpt, 0),
                                   "--use_pallas_kernels", "false"])
    engine, batcher, server = serve.build_server(ns)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    port = server.server_address[1]
    labels = json.load(open(os.path.join(base, "labels.json")))
    questions = {}
    qdir = os.path.join(base, "questions")
    for f in os.listdir(qdir):
        data = json.load(open(os.path.join(qdir, f)))
        house = f.split(".")[0]
        for tid, entry in data.items():
            questions["%s_%04d" % (house, int(tid))] = entry
    yield base, port, sorted(labels), questions
    server.shutdown()


def _post(port, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/predict",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req, timeout=300) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_healthz(served):
    _, port, _, _ = served
    with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz",
                                timeout=60) as r:
        body = json.loads(r.read())
    assert r.status == 200 and body["ok"] is True


def test_concurrent_requests_micro_batch(served):
    """N concurrent posts answer correctly through ONE padded forward (the
    150 ms batch window collects them; answers must be real vocab strings
    and per-request results must match a direct engine run)."""
    from videonavqa_tpu.datagen.ontology import ANSWER_VOCAB

    base, port, names, questions = served
    picks = names[:3]
    results = [None] * len(picks)

    def one(i, name):
        q_text = questions[name]["q_text"]
        results[i] = _post(port, {"video": name, "question": q_text})

    threads = [threading.Thread(target=one, args=(i, n))
               for i, n in enumerate(picks)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for status, body in results:
        assert status == 200, body
        assert body["answer"] in ANSWER_VOCAB
        assert len(body["top"]) == 5
        probs = [p for _, p in body["top"]]
        assert probs == sorted(probs, reverse=True)
        assert 0.0 < sum(probs) <= 1.0 + 1e-5


def test_stats_reflect_batching(served):
    """/stats counts the work and shows micro-batching (avg_batch > 1 after
    the concurrent test, which posts 3 requests into a 150 ms window)."""
    _, port, _, _ = served
    with urllib.request.urlopen(f"http://127.0.0.1:{port}/stats",
                                timeout=60) as r:
        s = json.loads(r.read())
    assert s["requests"] >= 3 and s["batches"] >= 1
    assert s["requests"] > s["batches"]  # at least one multi-request batch
    assert s["avg_forward_ms"] > 0
    # weight-swap observability: startup load is version 1; no int8 here
    assert s["weights_version"] >= 1
    assert s["int8_calibration_pending"] is False


def test_metrics_endpoint(served):
    """/metrics serves the batcher stats in Prometheus text format and
    /stats reports end-to-end latency percentiles (runs after the
    concurrent test, so requests have flowed)."""
    _, port, _, _ = served
    with urllib.request.urlopen(f"http://127.0.0.1:{port}/stats",
                                timeout=60) as r:
        s = json.loads(r.read())
    assert s["latency_p50_ms"] > 0
    assert s["latency_p99_ms"] >= s["latency_p95_ms"] >= s["latency_p50_ms"]

    with urllib.request.urlopen(f"http://127.0.0.1:{port}/metrics",
                                timeout=60) as r:
        assert r.headers["Content-Type"].startswith("text/plain")
        text = r.read().decode()
    assert "# TYPE videonavqa_requests_total counter" in text
    metrics = {line.split(" ")[0]: float(line.split(" ")[1])
               for line in text.splitlines() if not line.startswith("#")}
    assert metrics["videonavqa_requests_total"] == s["requests"]
    assert metrics["videonavqa_batches_total"] == s["batches"]
    assert (metrics['videonavqa_request_latency_seconds{quantile="0.50"}']
            == pytest.approx(s["latency_p50_ms"] / 1e3, rel=1e-4))


def test_bad_requests(served):
    _, port, names, questions = served
    status, body = _post(port, {"video": names[0],
                                "question": "utterly zxqv unknown words"})
    assert status == 400 and "vocabulary" in body["error"]
    status, body = _post(port, {"video": "no_such_video",
                                "question": questions[names[0]]["q_text"]})
    assert status == 400
    # valid JSON that is not an object must get a 400, not a dropped
    # connection (req["question"] on a list would TypeError in the handler)
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/predict", data=b"[1, 2]",
        headers={"Content-Type": "application/json"})
    try:
        urllib.request.urlopen(req, timeout=60)
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400
        assert "JSON object" in json.loads(e.read())["error"]


def test_feature_cache_requires_stem_model(served):
    """--feature_cache serving with a raw-video model (concat2d) fails at
    startup with a pointed error, not a KeyError mid-trace."""
    import jax

    from videonavqa_tpu.cli import serve
    from videonavqa_tpu.models import get_model
    from videonavqa_tpu.cli.common import build_q_and_v_parser, cfg_from_args
    from videonavqa_tpu.utils.checkpoint import save_checkpoint

    base, _, _, _ = served
    parser = serve.build_q_and_v_parser()
    parser.add_argument("--max_batch", type=int, default=2)
    common = ["--model", "concat2d", "--data_dir", base,
              "--embed_size", "8", "--hidden_size", "8",
              "--compute_dtype", "float32", "--feature_cache", "true"]
    args = parser.parse_args(common + ["--checkpoint_path", "x"])
    cfg = cfg_from_args(args, "concat2d")
    spec = get_model("concat2d")
    params, state = spec.init(jax.random.PRNGKey(0), cfg)
    ckpt = os.path.join(base, "c2d.ckpt.npz")
    save_checkpoint(ckpt, params=params, state=state)
    with pytest.raises(SystemExit, match="frozen-stem"):
        serve.InferenceEngine(
            parser.parse_args(common + ["--checkpoint_path", ckpt]))


@pytest.fixture(scope="module")
def served_cached(served):
    """A second server over the SAME dataset/checkpoint in --feature_cache
    production mode: precomputed frozen-stem features, no video decode, no
    stem in the forward."""
    from videonavqa_tpu.cli import extract_features, serve
    from videonavqa_tpu.cli.common import load_stem
    from videonavqa_tpu.data import DataPaths, load_json
    from videonavqa_tpu.data.vnr import ensure_built
    from videonavqa_tpu.utils.checkpoint import epoch_path

    base, _, _, questions = served
    ckpt = epoch_path(os.path.join(base, "serve_ckpt.npz"), 0)
    parser = serve.build_q_and_v_parser()
    parser.add_argument("--host", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=0)
    parser.add_argument("--max_batch", type=int, default=4)
    parser.add_argument("--batch_wait_ms", type=float, default=50.0)
    parser.add_argument("--serve_split", type=str, default="test")
    common = ["--model", "film_gp_pt", "--data_dir", base,
              "--batch_size", "2", "--num_res_blocks", "1",
              "--num_res_block_channels", "16", "--num_input_channels", "512",
              "--num_tail_channels", "4", "--embed_size", "8",
              "--hidden_size", "8", "--compute_dtype", "float32",
              "--checkpoint_path", ckpt, "--use_pallas_kernels", "false",
              "--feature_cache", "true"]
    ns = parser.parse_args(common)

    paths = DataPaths(base)
    split_map = load_json(paths.split_file)
    ensure_built()
    extract_features.extract_split(ns, load_stem(ns, paths), "test",
                                   split_map["test"])

    engine, batcher, server = serve.build_server(ns)
    assert engine.stem_fn is None and engine.feature_loader is not None
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield base, server.server_address[1], sorted(split_map["test"]), \
        questions, parser, common
    server.shutdown()


def test_cached_serving_by_example_id(served_cached):
    """Production mode answers by packed-example id through the stored
    feature planes — answers are real vocab strings with sane probs."""
    from videonavqa_tpu.datagen.ontology import ANSWER_VOCAB

    _, port, test_ids, questions, _, _ = served_cached
    name = test_ids[0]
    status, body = _post(port, {"example": name,
                                "question": questions[name]["q_text"]})
    assert status == 200, body
    assert body["answer"] in ANSWER_VOCAB
    probs = [p for _, p in body["top"]]
    assert probs == sorted(probs, reverse=True)
    assert 0.0 < sum(probs) <= 1.0 + 1e-5


def test_cached_serving_mode_routing(served_cached):
    """Cached servers reject "video" requests (and unknown example ids) with
    a pointed error instead of decoding anything."""
    _, port, test_ids, questions, _, _ = served_cached
    q = questions[test_ids[0]]["q_text"]
    status, body = _post(port, {"video": test_ids[0], "question": q})
    assert status == 400 and "example" in body["error"]
    status, body = _post(port, {"example": "no_such_example", "question": q})
    assert status == 400 and "unknown example" in body["error"]


def test_cached_auto_buckets_exact(served_cached):
    """--bucket_frames auto in --feature_cache mode picks the DP-optimal
    bucket edges from the stored container's length table and produces the
    same probabilities as unbucketed serving."""
    from videonavqa_tpu.cli import serve
    from videonavqa_tpu.data.buckets import optimal_frame_buckets

    _, _, test_ids, questions, parser, common = served_cached
    plain = serve.InferenceEngine(parser.parse_args(common))
    auto = serve.InferenceEngine(
        parser.parse_args(common + ["--bucket_frames", "auto"]))
    assert auto.frame_buckets == optimal_frame_buckets(
        auto.feature_loader.lengths)

    items = []
    for name in test_ids[:2]:
        frames, vl = auto.load_example(name)
        items.append((frames, vl, [1, 2, 3]))
    p_plain = plain.run_batch(items)
    p_auto = auto.run_batch(items)
    np.testing.assert_allclose(p_auto, p_plain, atol=1e-5)


def test_pipelined_batcher_parity(served_cached):
    """pipeline_depth >= 2 (dispatch on the worker thread, device fetch on
    the completion thread) answers every concurrent request with exactly the
    synchronous path's probabilities — no drops, no deadlock, stats intact."""
    from videonavqa_tpu.cli import serve

    _, _, test_ids, questions, parser, common = served_cached
    engine = serve.InferenceEngine(parser.parse_args(common))
    items = []
    for name in test_ids[:3]:
        frames, vl = engine.load_example(name)
        items.append((frames, vl, [1, 2, 3]))
    expect = engine.run_batch(items)

    for depth in (1, 3):
        batcher = serve.MicroBatcher(engine, batch_wait_ms=30.0,
                                     pipeline_depth=depth)
        results = [None] * 12

        def one(i):
            frames, vl, toks = items[i % len(items)]
            results[i] = batcher.submit(frames, vl, toks)

        threads = [threading.Thread(target=one, args=(i,)) for i in range(12)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for i, r in enumerate(results):
            np.testing.assert_allclose(r, expect[i % len(items)], atol=1e-5,
                                       err_msg=f"depth={depth} req={i}")
        with batcher._lock:
            s = dict(batcher.stats)
        assert s["requests"] == 12 and s["errors"] == 0
        assert s["forward_s"] > 0 and s["batches"] >= 3


def test_bucketed_serving_exact(served):
    """--bucket_frames serving trims the time axis per micro-batch and
    produces the SAME probabilities as the full 35-frame shape (the loaders'
    trimming-exactness guarantee extended to the daemon), while actually
    running a trimmed executable."""
    from videonavqa_tpu.cli import serve
    from videonavqa_tpu.utils.checkpoint import epoch_path

    base, _, _, _ = served
    parser = serve.build_q_and_v_parser()
    parser.add_argument("--max_batch", type=int, default=4)
    common = ["--model", "film_gp_pt", "--data_dir", base,
              "--batch_size", "2", "--num_res_blocks", "1",
              "--num_res_block_channels", "16", "--num_input_channels", "512",
              "--num_tail_channels", "4", "--embed_size", "8",
              "--hidden_size", "8", "--compute_dtype", "float32",
              "--checkpoint_path",
              epoch_path(os.path.join(base, "serve_ckpt.npz"), 0),
              "--use_pallas_kernels", "false"]
    plain = serve.InferenceEngine(parser.parse_args(common))
    bucketed = serve.InferenceEngine(
        parser.parse_args(common + ["--bucket_frames", "true"]))
    assert plain.frame_buckets is None
    assert bucketed.frame_buckets is not None

    rng = np.random.RandomState(0)
    items = []
    for vl in (3, 5):  # both fit the smallest (8-frame) bucket
        frames = np.zeros((35, *plain.frame_shape), plain.frame_dtype)
        frames[:vl] = rng.randint(
            0, 255, (vl, *plain.frame_shape)).astype(plain.frame_dtype)
        items.append((frames, vl, [1, 2, 3]))
    p_plain = plain.run_batch(items)
    p_bucketed = bucketed.run_batch(items)
    np.testing.assert_allclose(p_bucketed, p_plain, atol=1e-5)

    # warmup precompiles every bucket shape without error
    bucketed.warmup()


def test_hot_reload_swaps_weights(served):
    """POST /reload hot-swaps serving weights without restarting: answers
    for the same request change to the new checkpoint's and /healthz
    reports the new epoch."""
    import jax

    from videonavqa_tpu.cli.common import build_q_and_v_parser, cfg_from_args
    from videonavqa_tpu.models import get_model
    from videonavqa_tpu.utils.checkpoint import save_checkpoint

    base, port, names, questions = served
    q = questions[names[0]]["q_text"]
    before = _post(port, {"video": names[0], "question": q})[1]

    args = build_q_and_v_parser().parse_args(
        ["--model", "film_gp_pt", "--num_res_blocks", "1",
         "--num_res_block_channels", "16", "--num_input_channels", "512",
         "--num_tail_channels", "4", "--embed_size", "8",
         "--hidden_size", "8", "--compute_dtype", "float32"])
    cfg = cfg_from_args(args, "film_gp_pt")
    spec = get_model("film_gp_pt")
    params2, state2 = spec.init(jax.random.PRNGKey(99), cfg)
    alt = os.path.join(base, "alt.ckpt.npz")
    save_checkpoint(alt, params=params2, state=state2, meta={"epoch": 7})

    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/reload",
        data=json.dumps({"checkpoint_path": alt}).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=300) as r:
        body = json.loads(r.read())
    assert r.status == 200 and body["epoch"] == 7

    with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz",
                                timeout=60) as r:
        assert json.loads(r.read())["epoch"] == 7
    after = _post(port, {"video": names[0], "question": q})[1]
    assert [p for _, p in after["top"]] != [p for _, p in before["top"]]

    # bad path -> 400, weights unchanged
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/reload",
        data=json.dumps({"checkpoint_path": "/no/such.npz"}).encode(),
        headers={"Content-Type": "application/json"})
    try:
        urllib.request.urlopen(req, timeout=60)
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400

    # a REFERENCE torch checkpoint hot-reloads through the importer too
    # (load_any_checkpoint sniffs the format at the serving hot path)
    from videonavqa_tpu.utils.zoo_export import save_reference_checkpoint

    pt = os.path.join(base, "alt_ref.pt")
    save_reference_checkpoint(pt, "film_gp_pt", params2, state2, cfg,
                              epoch=9)
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/reload",
        data=json.dumps({"checkpoint_path": pt}).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=300) as r:
        assert json.loads(r.read())["epoch"] == 9
    status, body = _post(port, {"video": names[0], "question": q})
    assert status == 200
    from videonavqa_tpu.datagen.ontology import ANSWER_VOCAB

    assert body["answer"] in ANSWER_VOCAB

    # a corrupt checkpoint file must 400 (not drop the connection) and
    # leave the old weights serving
    bad = os.path.join(base, "corrupt.pt")
    with open(bad, "wb") as f:
        f.write(b"\x80\x02 this is not a checkpoint")
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/reload",
        data=json.dumps({"checkpoint_path": bad}).encode(),
        headers={"Content-Type": "application/json"})
    try:
        urllib.request.urlopen(req, timeout=60)
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400
    status, body = _post(port, {"video": names[0], "question": q})
    assert status == 200 and body["answer"] in ANSWER_VOCAB


def test_microbatcher_bucket_aware_dispatch():
    """Dispatch policy, driven with a stub engine (no jax): a saturated
    backlog dispatches the oldest request's bucket PURE when that bucket can
    fill a batch; an underfull mix dispatches as ONE batch (splitting only
    multiplies fixed per-forward costs); carried requests always complete."""
    import time

    from videonavqa_tpu.cli.serve import MicroBatcher

    class StubEngine:
        B = 4
        frame_buckets = (8, 12, 16, 20, 24, 28, 32, 35)
        batches = []

        def bucket_for(self, v_len):
            return min((t for t in self.frame_buckets if t >= max(v_len, 1)),
                       default=35)

        def run_batch(self, items):
            time.sleep(0.2)  # let the queue build up behind this forward
            self.batches.append([vl for _, vl, _ in items])
            return np.zeros((len(items), 70))

    engine = StubEngine()
    mb = MicroBatcher(engine, batch_wait_ms=30.0)
    # 9 short (bucket 8) + 2 long (bucket 16), shorts oldest. The backlog
    # builds behind the slow forwards, so a later collection sees > B
    # requests where the oldest's bucket fills a batch -> pure dispatch with
    # the longs carried; the final underfull remainder dispatches mixed.
    lens = [2, 3, 4, 5, 2, 3, 4, 5, 6, 15, 16]
    threads = [threading.Thread(
        target=lambda vl=vl: mb.submit(np.zeros((1, 1)), vl, [1]))
        for vl in lens]
    for t in threads:
        t.start()
        time.sleep(0.002)  # deterministic arrival order
    for t in threads:
        t.join()
    assert sorted(sum(engine.batches, [])) == sorted(lens)  # all served
    for b in engine.batches:
        assert len(b) <= 4
    first = engine.batches[0]
    assert len(first) == 4 and all(vl <= 8 for vl in first)  # pure + full
    assert mb.stats["requests"] == 11 and mb.stats["errors"] == 0
    assert mb.stats["deferred"] >= 1  # the longs were carried at least once

    # underfull mixed collection: one batch, no splitting
    engine2 = StubEngine()
    engine2.batches = []
    mb2 = MicroBatcher(engine2, batch_wait_ms=60.0)
    threads = [threading.Thread(
        target=lambda vl=vl: mb2.submit(np.zeros((1, 1)), vl, [1]))
        for vl in (2, 15)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert engine2.batches and sorted(engine2.batches[0]) == [2, 15]


def test_int8_serving_self_calibrates(served):
    """--int8_trunk serving: the first micro-batch runs the f32 calibration
    forward (recording static act scales into state); later batches run
    static int8 and stay close to the calibration output."""
    from videonavqa_tpu.cli import serve
    from videonavqa_tpu.utils.checkpoint import epoch_path

    base, _, _, _ = served
    parser = serve.build_q_and_v_parser()
    parser.add_argument("--max_batch", type=int, default=2)
    eng = serve.InferenceEngine(parser.parse_args(
        ["--model", "film_gp_pt", "--data_dir", base,
         "--batch_size", "2", "--num_res_blocks", "1",
         "--num_res_block_channels", "16", "--num_input_channels", "512",
         "--num_tail_channels", "4", "--embed_size", "8",
         "--hidden_size", "8", "--compute_dtype", "float32",
         "--checkpoint_path",
         epoch_path(os.path.join(base, "serve_ckpt.npz"), 0),
         "--use_pallas_kernels", "false", "--int8_trunk", "true"]))
    assert eng._needs_int8_calibration
    rng = np.random.RandomState(3)
    frames = np.zeros((35, *eng.frame_shape), eng.frame_dtype)
    frames[:4] = rng.randint(0, 255, (4, *eng.frame_shape)).astype(
        eng.frame_dtype)
    items = [(frames, 4, [2, 3])]
    p_cal = eng.run_batch(items)  # f32 calibration pass
    assert not eng._needs_int8_calibration
    scales = eng.state["trunk"]["int8_scales"]
    assert set(scales) == {"conv_init", "conv1x1_0", "conv3x3_0"}
    p_static = eng.run_batch(items)  # static int8
    assert np.argmax(p_static[0]) == np.argmax(p_cal[0])
    np.testing.assert_allclose(p_static, p_cal, atol=0.05)


def test_microbatcher_sheds_load_past_max_pending():
    """submit raises Overloaded (-> HTTP 503) once max_pending requests are
    outstanding, instead of queueing MBs of frames until the host OOMs."""
    import time

    from videonavqa_tpu.cli.serve import MicroBatcher, Overloaded

    release = threading.Event()

    class SlowEngine:
        B = 2
        frame_buckets = None

        def bucket_for(self, v_len):
            return 35

        def run_batch(self, items):
            release.wait(5.0)
            return np.zeros((len(items), 70))

    mb = MicroBatcher(SlowEngine(), batch_wait_ms=1.0, max_pending=2)
    results = []
    threads = [threading.Thread(
        target=lambda: results.append(mb.submit(np.zeros(1), 1, [1])))
        for _ in range(2)]
    for t in threads:
        t.start()
    time.sleep(0.3)  # both outstanding (worker blocked in run_batch)
    with pytest.raises(Overloaded):
        mb.submit(np.zeros(1), 1, [1])
    assert mb.stats["rejected"] == 1
    release.set()
    for t in threads:
        t.join()
    assert len(results) == 2 and mb.pending() == 0


def test_mesh_sharded_serving_matches_single_device(served):
    """--mesh_devices shards serving micro-batches over the 'data' axis with
    the training harness's GSPMD placement; probabilities match the
    single-device engine."""
    from videonavqa_tpu.cli import serve
    from videonavqa_tpu.utils.checkpoint import epoch_path

    base, _, _, _ = served
    parser = serve.build_q_and_v_parser()
    parser.add_argument("--max_batch", type=int, default=4)
    common = ["--model", "film_gp_pt", "--data_dir", base,
              "--batch_size", "2", "--num_res_blocks", "1",
              "--num_res_block_channels", "16", "--num_input_channels", "512",
              "--num_tail_channels", "4", "--embed_size", "8",
              "--hidden_size", "8", "--compute_dtype", "float32",
              "--checkpoint_path",
              epoch_path(os.path.join(base, "serve_ckpt.npz"), 0),
              "--use_pallas_kernels", "false"]
    single = serve.InferenceEngine(parser.parse_args(common))
    meshed = serve.InferenceEngine(
        parser.parse_args(common + ["--mesh_devices", "4"]))
    assert meshed.mesh is not None and meshed.mesh.shape["data"] == 4

    rng = np.random.RandomState(1)
    items = []
    for vl in (2, 4, 3):
        frames = np.zeros((35, *single.frame_shape), single.frame_dtype)
        frames[:vl] = rng.randint(
            0, 255, (vl, *single.frame_shape)).astype(single.frame_dtype)
        items.append((frames, vl, [4, 5]))
    want = single.run_batch(items)
    np.testing.assert_allclose(meshed.run_batch(items), want, atol=1e-5)

    # tensor-parallel serving: widest projections shard over 'model'
    mp = serve.InferenceEngine(parser.parse_args(
        common + ["--mesh_devices", "4", "--model_parallel", "2"]))
    assert mp.mesh.shape == {"data": 2, "model": 2}
    np.testing.assert_allclose(mp.run_batch(items), want, atol=1e-5)

    # max_batch must divide the data axis
    with pytest.raises(SystemExit, match="must divide"):
        serve.InferenceEngine(
            parser.parse_args(common + ["--mesh_devices", "3"]))


def test_cached_serving_refuses_stale_stem(served_cached):
    """Startup fails loudly when the cache's recorded stem fingerprint does
    not match the serving args (here: a different --compute_dtype)."""
    from videonavqa_tpu.cli import serve

    _, _, _, _, parser, common = served_cached
    stale = [a if a != "float32" else "bfloat16" for a in common]
    with pytest.raises(SystemExit, match="different\\s+stem"):
        serve.build_server(parser.parse_args(stale))


def test_int8_calibration_discarded_when_reload_races(served):
    """A hot /reload landing mid-calibration must win: the calibration
    commit is a compare-and-swap on the weights version, so the worker must
    NOT write the old params + calibrated state back over the fresh
    checkpoint, and the next micro-batch must re-calibrate the new one."""
    from videonavqa_tpu.cli import serve
    from videonavqa_tpu.utils.checkpoint import epoch_path

    base, _, _, _ = served
    parser = serve.build_q_and_v_parser()
    parser.add_argument("--max_batch", type=int, default=2)
    eng = serve.InferenceEngine(parser.parse_args(
        ["--model", "film_gp_pt", "--data_dir", base,
         "--batch_size", "2", "--num_res_blocks", "1",
         "--num_res_block_channels", "16", "--num_input_channels", "512",
         "--num_tail_channels", "4", "--embed_size", "8",
         "--hidden_size", "8", "--compute_dtype", "float32",
         "--checkpoint_path",
         epoch_path(os.path.join(base, "serve_ckpt.npz"), 0),
         "--use_pallas_kernels", "false", "--int8_trunk", "true"]))
    assert eng._needs_int8_calibration

    real_calibrate = eng._forward_calibrate

    def racing_calibrate(*a, **kw):
        out = real_calibrate(*a, **kw)
        eng.reload()  # lands between the calibration forward and its commit
        return out

    eng._forward_calibrate = racing_calibrate
    frames = np.zeros((35, *eng.frame_shape), eng.frame_dtype)
    frames[0, 0, 0] = 7
    eng.run_batch([(frames, 1, [2])])
    # the racing reload's weights survive; the stale calibration is dropped
    assert eng._needs_int8_calibration
    assert "int8_scales" not in eng.state.get("trunk", {})
    eng._forward_calibrate = real_calibrate
    eng.run_batch([(frames, 1, [2])])  # next batch calibrates the new ckpt
    assert not eng._needs_int8_calibration
    assert "int8_scales" in eng.state["trunk"]


def test_int8_stem_serving_calibrates_on_stored_video(served, tmp_path,
                                                      monkeypatch):
    """--int8_stem in video mode calibrates the stem's activation scales at
    STARTUP on a real stored video (requests reference videos in
    data_dir/videos — unlike warmup zeros/noise, real pixels are
    representative traffic). The int8 stem's numerics are covered at reduced
    width in test_int8_stem.py; full-size int8 convs are impractically slow
    on the CPU backend, so here a spy stem verifies the serving seam: the
    engine hands load_stem a real-pixel calibration batch, serves through
    the returned stem, and fails loudly when no stored video exists."""
    import jax.numpy as jnp

    from videonavqa_tpu.cli import serve
    from videonavqa_tpu.utils.checkpoint import epoch_path

    base, _, _, _ = served
    parser = serve.build_q_and_v_parser()
    parser.add_argument("--max_batch", type=int, default=2)
    common = ["--model", "film_gp_pt", "--data_dir", base,
              "--batch_size", "2", "--num_res_blocks", "1",
              "--num_res_block_channels", "16", "--num_input_channels", "512",
              "--num_tail_channels", "4", "--embed_size", "8",
              "--hidden_size", "8", "--compute_dtype", "float32",
              "--checkpoint_path",
              epoch_path(os.path.join(base, "serve_ckpt.npz"), 0),
              "--use_pallas_kernels", "false"]

    seen = {}

    def spy_load_stem(args, paths, calibration_video=None, mesh=None):
        seen["calib"] = calibration_video

        def stem_fn(video):
            B, T = video.shape[:2]
            m = jnp.mean(video, axis=(2, 3, 4))
            return jnp.broadcast_to(m[:, :, None, None, None],
                                    (B, T, 10, 13, 512))

        return stem_fn

    monkeypatch.setattr(serve, "load_stem", spy_load_stem)
    eng = serve.InferenceEngine(parser.parse_args(
        common + ["--int8_stem", "true"]))
    assert eng.stem_is_int8
    calib = seen["calib"]
    # a real decoded video, trimmed to its true length, scaled to [0, 1]
    assert calib.ndim == 5 and calib.shape[0] == 1
    assert calib.shape[2:] == (160, 208, 3)
    assert calib.dtype == jnp.float32
    assert 0.0 < float(jnp.max(calib)) <= 1.0  # real pixels, not zeros

    frames = np.zeros((35, *eng.frame_shape), eng.frame_dtype)
    frames[:2] = 128
    probs = eng.run_batch([(frames, 2, [2, 3])])
    assert probs.shape == (1, 70)
    assert np.all(np.isfinite(probs))
    np.testing.assert_allclose(probs.sum(axis=-1), 1.0, atol=1e-3)

    # no stored videos -> loud startup failure, not silent mis-calibration
    import shutil

    empty = str(tmp_path / "empty_data")
    os.makedirs(os.path.join(empty, "videos"))
    for f in ("labels.json", "q_ids.json", "split.json", "vocab.json"):
        shutil.copy(os.path.join(base, f), os.path.join(empty, f))
    shutil.copytree(os.path.join(base, "encoded_questions"),
                    os.path.join(empty, "encoded_questions"))
    bad = [a if a != base else empty for a in common] + ["--int8_stem", "true"]
    with pytest.raises(SystemExit, match="calibrates on a stored video"):
        serve.InferenceEngine(parser.parse_args(bad))


def test_video_mode_warmup_recalibrates_on_real_traffic(served):
    """warmup() with --int8_trunk in video (pixel) mode must NOT leave the
    daemon serving on scales calibrated from its all-zero warmup frames: a
    black video's stem activations sit far below real traffic's, so those
    scales would hard-clip every conv at +-127 and silently serve garbage.
    warmup calibrates provisionally on random pixels (warming the
    executables), then re-arms so the FIRST REAL micro-batch commits
    traffic-derived scales."""
    from videonavqa_tpu.cli import serve
    from videonavqa_tpu.utils.checkpoint import epoch_path

    base, _, _, _ = served
    parser = serve.build_q_and_v_parser()
    parser.add_argument("--max_batch", type=int, default=2)
    eng = serve.InferenceEngine(parser.parse_args(
        ["--model", "film_gp_pt", "--data_dir", base,
         "--batch_size", "2", "--num_res_blocks", "1",
         "--num_res_block_channels", "16", "--num_input_channels", "512",
         "--num_tail_channels", "4", "--embed_size", "8",
         "--hidden_size", "8", "--compute_dtype", "float32",
         "--checkpoint_path",
         epoch_path(os.path.join(base, "serve_ckpt.npz"), 0),
         "--use_pallas_kernels", "false", "--int8_trunk", "true"]))
    eng.warmup()
    # still armed: real traffic, not the warmup frames, sets the scales
    assert eng._needs_int8_calibration
    provisional = {k: float(v) for k, v in
                   eng.state["trunk"]["int8_scales"].items()}
    # provisional scales came from random pixels, not the black frames
    assert all(v > 0 for v in provisional.values())
    rng = np.random.RandomState(11)
    frames = np.zeros((35, *eng.frame_shape), eng.frame_dtype)
    frames[:4] = rng.randint(0, 255, (4, *eng.frame_shape)).astype(
        eng.frame_dtype)
    eng.run_batch([(frames, 4, [2, 3])])
    assert not eng._needs_int8_calibration
    committed = eng.state["trunk"]["int8_scales"]
    assert any(float(committed[k]) != provisional[k] for k in provisional)


def test_cached_serving_replica_scaling(served_cached):
    """Replica scaling of the production (cached-feature) serving engine on
    the virtual CPU mesh: 1/2/4/8-way --mesh_devices data sharding produces
    IDENTICAL probabilities, and each device holds exactly B/N rows of the
    staged micro-batch (the dispatch-capacity structure — per-chip batch
    work shrinks linearly with replicas). Reference anchor: the one-GPU
    placement being generalized, eval/utils.py:27."""
    from videonavqa_tpu.cli import serve

    base, _, test_ids, questions, parser, common = served_cached
    common = [a for a in common]
    engines = {}
    for n in (0, 2, 4, 8):
        argv = common + ["--max_batch", "8"]
        if n:
            argv += ["--mesh_devices", str(n)]
        engines[n] = serve.InferenceEngine(parser.parse_args(argv))

    items = []
    for name in test_ids[:6]:
        frames, v_len = engines[0].load_example(name)
        items.append((frames, v_len,
                      engines[0].encode_question(questions[name]["q_text"])))

    want = engines[0].run_batch(items)
    for n in (2, 4, 8):
        got = engines[n].run_batch(items)
        np.testing.assert_allclose(got, want, atol=1e-5,
                                   err_msg=f"mesh_devices={n}")
        assert engines[n].mesh.shape["data"] == n


def test_video_serving_cnn3d_buckets_exact(served):
    """Video-mode serving of v_only_cnn3d with --bucket_frames: the daemon
    trims the staged batch to the covering bucket and the zero-run splice
    reproduces the reference's full 35-frame volume — probabilities match
    the unbucketed engine exactly (the model the buckets used to exclude)."""
    from videonavqa_tpu.cli import serve
    from videonavqa_tpu.models import get_model
    from videonavqa_tpu.utils.checkpoint import save_checkpoint
    from videonavqa_tpu.cli.common import cfg_from_args

    base, _, _, _ = served
    parser = serve.build_q_and_v_parser()
    parser.add_argument("--max_batch", type=int, default=2)
    common = ["--model", "v_only_cnn3d", "--data_dir", base,
              "--batch_size", "2", "--hidden_size", "128",
              "--compute_dtype", "float32",
              "--use_pallas_kernels", "false"]
    ckpt = os.path.join(base, "serve_cnn3d.npz")
    if not os.path.exists(ckpt):
        spec = get_model("v_only_cnn3d")
        ns0 = parser.parse_args(common + ["--checkpoint_path", ckpt])
        params, state = spec.init(jax.random.PRNGKey(3),
                                  cfg_from_args(ns0, "v_only_cnn3d"))
        save_checkpoint(ckpt, params=params, state=state)

    plain = serve.InferenceEngine(
        parser.parse_args(common + ["--checkpoint_path", ckpt]))
    bucketed = serve.InferenceEngine(
        parser.parse_args(common + ["--checkpoint_path", ckpt,
                                    "--bucket_frames", "true"]))
    assert bucketed.frame_buckets

    rng = np.random.RandomState(4)
    items = []
    for vl in (5, 3):
        frames = np.zeros((35, *plain.frame_shape), plain.frame_dtype)
        frames[:vl] = rng.randint(
            0, 255, (vl, *plain.frame_shape)).astype(plain.frame_dtype)
        items.append((frames, vl, [1]))
    # round 5: the bucketed engine precomputes the zero-run columns once per
    # weights version (_attach_c3d_zero -> state['c3d_zero']) so the splice
    # skips the in-step zero-run; run_batch parity below proves the cached
    # path, and reload() must re-attach for the new weights
    assert "c3d_zero" in bucketed.state
    assert "c3d_zero" not in plain.state

    want = plain.run_batch(items)
    got = bucketed.run_batch(items)
    assert bucketed.bucket_for(5) < 35  # actually trimmed
    np.testing.assert_allclose(got, want, atol=1e-4)

    bucketed.reload(ckpt)
    assert "c3d_zero" in bucketed.state
    np.testing.assert_allclose(bucketed.run_batch(items), want, atol=1e-4)
