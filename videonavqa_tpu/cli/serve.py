"""Batch-serving daemon: HTTP endpoint over the jitted eval forward.

A production-serving surface the reference lacks entirely (its only
inference path is the offline test harness, eval/q_and_v_test.py). Requests
are MICRO-BATCHED: a collector thread gathers up to --max_batch requests (or
whatever arrived within --batch_wait_ms of the first) and runs them through
ONE fixed-shape jitted forward — so the server compiles a small fixed set of
executables and concurrent load rides the MXU at batch efficiency instead of
batch-1 latency. Dispatch is PIPELINED (``--pipeline_depth``, default 2):
jax enqueues the forward asynchronously and a completion thread fetches the
result, so the next micro-batch's staging memcpy and host->device transfer
overlap the current batch's device compute. Pads the batch with zero rows;
shapes are pinned to
[max_batch, T, ...] / [max_batch, 56], where T is 35 or, under
``--bucket_frames``, the smallest frame bucket covering the micro-batch's max
v_len (the headline serving recipe — one executable per bucket, precompiled
by ``--warmup``; exact for every model, v_only_cnn3d via the zero-run splice).

    python -m videonavqa_tpu.cli.serve --model film_attn_pt \
        --data_dir /path/to/data --checkpoint_path e0_film.ckpt \
        --port 8808 --max_batch 8 [--int8_trunk true]

    POST /predict   {"video": "<path, relative to videos/ or absolute>",
                     "question": "Is there a blue table in the kitchen?"}
      -> {"answer": str, "top": [[answer, prob] x5]}
    GET  /healthz   -> {"ok": true, "pending": n, "epoch": e}
    GET  /stats     -> {"requests", "batches", "errors", "deferred",
                        "avg_batch", "avg_forward_ms", "latency_p50_ms",
                        "latency_p95_ms", "latency_p99_ms",
                        "weights_version", "int8_calibration_pending", ...}
    GET  /metrics   -> the same stats in Prometheus text format
                       (videonavqa_* counters/gauges + latency summary)
    POST /reload    {"checkpoint_path": "<optional new .npz>"}
      -> hot weight swap, zero downtime (in-flight batches finish on the
         old weights). SIGTERM/SIGINT drain gracefully.

Serving kernels: --use_pallas_kernels auto-enables on TPU (2.0x batch-1,
PERF.md); --int8_trunk is opt-in (1.76x at batch serving with static scales) and
self-calibrates STATIC activation scales on its first micro-batch (during
--warmup in cached mode), removing the per-batch absmax reductions that
made dynamic int8 lose at batch 1. In video (online-stem) mode,
--int8_stem additionally quantizes the frozen VGG stem — the dominant
FLOPs of online serving — calibrating its activation scales at startup on
a real stored video (--int8_stem_calibration_video; accuracy caveat in
PERF.md applies, opt-in).

Production mode — ``--feature_cache true``: serves PRECOMPUTED frozen-stem
features (the deployment shape behind the ~1000 videos/s serving bench): the
daemon opens ``features_<split>.fnr`` via the native loader (refusing a
stale stem fingerprint at startup), skips video decode and the stem
entirely, and requests address packed examples by id:

    POST /predict   {"example": "<example id>", "question": "..."}
"""

from __future__ import annotations

import collections
import json
import os
import queue
import threading
import time

import numpy as np

import jax
import jax.numpy as jnp

from videonavqa_tpu.cli.common import cfg_from_args, load_stem
from videonavqa_tpu.cli.common import build_q_and_v_parser as _build_base_parser
from videonavqa_tpu.data import DataPaths, load_json
from videonavqa_tpu.data.pipeline import _decode_video, subsample_frames
from videonavqa_tpu.datagen.encode import tokenize
from videonavqa_tpu.datagen.ontology import ANSWER_VOCAB
from videonavqa_tpu.models import get_model
from videonavqa_tpu.utils import checkpoint as ckpt
from videonavqa_tpu.utils import constants as C

CLASS_TO_ANSWER = {v: k for k, v in ANSWER_VOCAB.items()}


def build_q_and_v_parser():
    """The training harness's flag surface, with --model widened to the
    video-only zoo members: the training CLIs keep the reference's exact
    choices per harness (eval/q_and_v_eval.py:31 vs eval/v_only_*_eval.py),
    but the daemon is an extra surface the reference lacks and serves every
    video-consuming model through the same engine (batch['video'] path)."""
    parser = _build_base_parser()
    for action in parser._actions:
        if action.dest == "model":
            action.choices = sorted(set(action.choices)
                                    | {"v_only_cnn3d", "v_only_cnn2d_lstm"})
    return parser


class Overloaded(RuntimeError):
    """Raised by MicroBatcher.submit past max_pending; maps to HTTP 503."""


class InferenceEngine:
    """Loads the model once; serves padded fixed-shape micro-batches."""

    def __init__(self, args):
        self.args = args
        self.paths = DataPaths(args.data_dir)
        vocab_path = os.path.join(args.data_dir, "vocab.json")
        self.vocab = load_json(vocab_path) if os.path.exists(vocab_path) else None
        self.cfg = cfg_from_args(args, args.model)
        use_pallas = getattr(args, "use_pallas_kernels", None)
        if use_pallas is None:
            use_pallas = jax.default_backend() not in ("cpu",)
        if use_pallas:
            import dataclasses

            self.cfg = dataclasses.replace(self.cfg, use_pallas_kernels=True)
        # scale-out serving: --mesh_devices shards each micro-batch over the
        # 'data' axis (and the widest projections over 'model'), same GSPMD
        # placement as the training harness (PARALLEL.md). Single-controller
        # only — a serving replica owns its chips.
        self.mesh = None
        self.B = args.max_batch
        n_mesh = getattr(args, "mesh_devices", 0) or 0
        if n_mesh:
            from videonavqa_tpu.parallel import batch_sharding, make_mesh

            self.mesh = make_mesh(
                n_mesh, model_parallel=getattr(args, "model_parallel", 1) or 1)
            data_size = self.mesh.shape["data"]
            if self.B % data_size:
                raise SystemExit(
                    f"--max_batch {self.B} must divide by the 'data' mesh "
                    f"axis ({data_size})")
            self._batch_spec = batch_sharding(self.mesh)

        self.spec = get_model(args.model)
        # weights swap/commit coordination: _load_weights (hot reload) bumps
        # _weights_version under _weights_lock; the int8 calibration commit in
        # run_batch is a compare-and-swap on that version, so a reload that
        # lands mid-calibration wins (instead of the worker writing the OLD
        # params + calibrated state back over the fresh checkpoint)
        self._weights_lock = threading.Lock()
        self._weights_version = 0
        self._needs_int8_calibration = False
        self.epoch = self._load_weights(args.checkpoint_path)
        # handler threads share this RandomState (frame-subsample picks);
        # RandomState is not thread-safe, so all draws go through _rng_lock
        self.rng = np.random.RandomState(args.seed)
        self._rng_lock = threading.Lock()

        self.feature_loader = None
        self.stem_is_int8 = False
        self.stem_fingerprint_hex = None
        if getattr(args, "feature_cache", False):
            if not self.spec.uses_stem:
                raise SystemExit(
                    f"--feature_cache serving requires a frozen-stem model; "
                    f"{args.model} consumes raw video (batch['video']) and "
                    f"has no cached-feature input")
            # production mode: precomputed stem features by example id; the
            # stem never loads and videos never decode
            from videonavqa_tpu.cli.extract_features import (
                feature_file, stem_fingerprint,
            )
            from videonavqa_tpu.data.vnr import (
                VNRBatchLoader, ensure_built, read_fingerprint,
            )

            split = getattr(args, "serve_split", "test")
            dtype = getattr(args, "feature_dtype", "bfloat16") or "bfloat16"
            path = feature_file(args.data_dir, split, dtype)
            if not os.path.exists(path):
                raise SystemExit(
                    f"--feature_cache serving requires {path} "
                    f"(run cli.extract_features first)")
            have, want = read_fingerprint(path), stem_fingerprint(args, self.paths)
            if have != want:
                raise SystemExit(
                    f"feature cache {path} was extracted with a different "
                    f"stem ({have.hex() if have else 'legacy v1'} != "
                    f"{want.hex()}) — re-extract before serving")
            # surfaced in /stats so production can audit WHICH stem produced
            # the features this daemon serves (reference loads the stem per
            # process with no provenance at all, eval/utils.py:42-51)
            self.stem_fingerprint_hex = want.hex()
            ensure_built()
            self.feature_loader = VNRBatchLoader(path, 1, shuffle=False,
                                                 mode="test")
            split_map = load_json(self.paths.split_file)
            # feature-file order == sorted split ids (pack_dataset sorts)
            self.id_to_idx = {n: i for i, n in
                              enumerate(sorted(split_map[split]))}
            # LRU over decoded [T,10,13,512] planes: a full-example zstd
            # decode is ~19 MB of work per request, so hot examples are
            # served from memory (~19 MB/entry bf16; half that fp8)
            self._example_cache = collections.OrderedDict()
            self._example_cache_size = max(
                0, getattr(args, "example_cache", 64))
            self._decode_lock = threading.Lock()
            self.frame_shape = self.feature_loader.frame_shape
            self.frame_dtype = self.feature_loader.frame_dtype
            self.stem_fn = None
        else:
            self.frame_shape = (C.VID_HEIGHT, C.VID_WIDTH, 3)
            self.frame_dtype = np.dtype(np.uint8)
            calib = (self._stem_calibration_batch(args)
                     if self.spec.uses_stem and getattr(args, "int8_stem",
                                                        False) else None)
            self.stem_is_int8 = calib is not None
            self.stem_fn = (load_stem(args, self.paths,
                                      calibration_video=calib, mesh=self.mesh)
                            if self.spec.uses_stem else None)

        # length-bucketed batches (the headline serving recipe): trim each
        # micro-batch's time axis to the smallest bucket >= its max v_len —
        # exact for every model (v_only_cnn3d via the zero-run splice,
        # models/v_only_cnn3d.py); one jitted executable per bucket shape
        self.frame_buckets = None
        bucket = getattr(args, "bucket_frames", False)
        if bucket:
            from videonavqa_tpu.data.buckets import resolve_frame_buckets
            from videonavqa_tpu.data.pipeline import BatchLoader

            if bucket == "auto" and self.feature_loader is not None:
                # dataset-optimal edges from the stored container's own
                # length histogram (data/buckets.py DP)
                self.frame_buckets = resolve_frame_buckets(
                    "auto", lambda: self.feature_loader.lengths,
                    BatchLoader.DEFAULT_FRAME_BUCKETS)
            else:
                # video mode has no ahead-of-time length table — use the
                # fixed grid ("auto" falls back with a note)
                if bucket == "auto":
                    print("=> --bucket_frames auto needs --feature_cache; "
                          "using the default bucket grid")
                self.frame_buckets = BatchLoader.DEFAULT_FRAME_BUCKETS
        self._attach_c3d_zero()

        cfg, spec, stem_fn = self.cfg, self.spec, self.stem_fn
        cached = self.feature_loader is not None

        def make_batch(visual, question, v_len, q_len):
            batch = {"question": question, "v_len": v_len, "q_len": q_len}
            if cached:
                batch["v_features"] = visual  # stored bf16/fp8 planes
            else:
                video = visual.astype(jnp.float32) / 255.0  # u8 transfer
                if stem_fn is not None:
                    batch["v_features"] = stem_fn(video)
                else:
                    batch["video"] = video
            return batch

        @jax.jit
        def forward(params, state, visual, question, v_len, q_len):
            logits, _ = spec.apply(params, state,
                                   make_batch(visual, question, v_len, q_len),
                                   cfg, train=False, rng=jax.random.PRNGKey(0))
            return jax.nn.softmax(logits, axis=-1)

        self._forward = forward

        # static int8 activation scales: the first micro-batch runs an f32
        # calibration forward that records per-conv absmax into the state;
        # every later batch uses them (no per-batch absmax reductions — the
        # latency cost that made dynamic int8 lose at batch 1, PERF.md)
        if getattr(self.cfg, "use_int8_trunk", False):
            import dataclasses

            cal_cfg = dataclasses.replace(self.cfg, int8_trunk_calibrate=True)

            @jax.jit
            def forward_calibrate(params, state, visual, question, v_len,
                                  q_len):
                logits, new_state = spec.apply(
                    params, state, make_batch(visual, question, v_len, q_len),
                    cal_cfg, train=False, rng=jax.random.PRNGKey(0))
                return jax.nn.softmax(logits, axis=-1), new_state

            self._forward_calibrate = forward_calibrate

    def _attach_c3d_zero(self):
        """v_only_cnn3d + frame buckets: precompute the serving zero-run
        columns for every bucket width (a pure function of params + eval BN
        statistics, models/v_only_cnn3d.py precompute_c3d_zero_slices — the
        int8_wq pattern), so bucketed serving never recomputes the ~14 ms
        in-step zero-run and every bucket takes the splice. Re-attached on
        hot reload (new weights -> new zero-run)."""
        if (self.args.model != "v_only_cnn3d"
                or not getattr(self, "frame_buckets", None)):
            return
        from videonavqa_tpu.models.v_only_cnn3d import (
            _SPLICE_MAX_T_CACHED,
            precompute_c3d_zero_slices,
        )

        widths = [t for t in self.frame_buckets
                  if 0 < t <= min(_SPLICE_MAX_T_CACHED,
                                  self.cfg.max_num_frames - 1)]
        if not widths:
            return
        with self._weights_lock:
            params, state = self._weights
            zc = precompute_c3d_zero_slices(params, state, self.cfg, widths)
            if self.mesh is not None:
                from videonavqa_tpu.parallel import replicate

                zc = replicate(zc, self.mesh)
            self._weights = (params, {**state, "c3d_zero": zc})

    def _load_weights(self, path):
        """Load a framework checkpoint and pin it on device (mesh-aware).
        Returns the checkpoint's epoch. Also the hot-reload path: the swap
        assigns ONE (params, state) tuple reference under the GIL — readers
        unpack it in a single load, so a concurrent micro-batch either runs
        entirely on the old checkpoint or entirely on the new one (separate
        params/state attributes could tear: new weights under old BN
        statistics)."""
        if not path or not os.path.exists(path):
            raise ValueError(f"checkpoint {path!r} does not exist")
        params, state = self.spec.init(
            jax.random.PRNGKey(self.args.seed), self.cfg)
        params, state_r, _, meta = ckpt.load_any_checkpoint(
            path, model_name=self.args.model, cfg=self.cfg,
            params_template=params, state_template=state)
        state = state_r if state_r is not None else state
        # pin restored weights on device: load_checkpoint returns HOST numpy
        # arrays, and passing those to the jitted forward re-uploads every
        # weight on every batch (measured 6s/batch at the flagship preset
        # over the axon tunnel)
        if self.mesh is not None:
            from videonavqa_tpu.parallel import (
                param_shardings, put_global, replicate,
            )

            new_params = put_global(params, param_shardings(params, self.mesh))
            new_state = replicate(state, self.mesh)
        else:
            new_params = jax.device_put(params)
            new_state = jax.device_put(state)
        with self._weights_lock:
            self._weights = (new_params, new_state)
            self._weights_version += 1
            # new weights need fresh int8 activation scales
            if getattr(self.cfg, "use_int8_trunk", False):
                self._needs_int8_calibration = True
        return int(meta.get("epoch", 0)) if meta else 0

    @property
    def params(self):
        return self._weights[0]

    @property
    def state(self):
        return self._weights[1]

    def reload(self, path=None):
        """Hot-swap serving weights from ``path`` (default: the checkpoint
        the daemon started with, e.g. after a trainer overwrote it). New
        weights need fresh int8 activation scales — _load_weights flags the
        next micro-batch to re-calibrate, atomically with the swap."""
        self.epoch = self._load_weights(path or self.args.checkpoint_path)
        self._attach_c3d_zero()  # new weights -> new zero-run columns
        return self.epoch

    def encode_question(self, text):
        if self.vocab is None:
            raise ValueError("no vocab.json in data_dir — cannot tokenize")
        tokens = []
        for tok in tokenize(text):
            if tok not in self.vocab:
                raise ValueError(f"token {tok!r} not in the dataset vocabulary")
            tokens.append(self.vocab[tok])
        return tokens[: C.MAX_Q_LEN]

    def _stem_calibration_batch(self, args):
        """--int8_stem serving: calibrate the stem's activation scales at
        STARTUP on a real stored video — requests reference videos under
        ``data_dir/videos``, so any stored video is representative traffic
        (unlike warmup zeros/noise, which would mis-scale every conv; see
        warmup's int8-trunk note). ``--int8_stem_calibration_video`` picks
        the video; default is the alphabetically first stored one. Trimmed
        to its real length: zero pad adds nothing to an absmax."""
        name = getattr(args, "int8_stem_calibration_video", None)
        if not name:
            try:
                name = sorted(
                    f for f in os.listdir(self.paths.videos_dir)
                    if f.endswith((".mp4", ".npy")))[0]
            except (FileNotFoundError, IndexError):
                raise SystemExit(
                    "--int8_stem serving calibrates on a stored video at "
                    f"startup but none were found in {self.paths.videos_dir};"
                    " pass --int8_stem_calibration_video <path>")
        frames, v_len = self.load_video(name)
        print(f"=> int8 stem: calibrating on {name} ({v_len} frames)")
        calib = frames[None, : max(int(v_len), 1)]
        return jnp.asarray(calib).astype(jnp.float32) / 255.0

    def load_video(self, path):
        """Decode + subsample one video to [35, H, W, 3] u8 (zero-padded)."""
        if self.feature_loader is not None:
            raise ValueError('this server serves precomputed examples — '
                             'POST {"example": "<id>", ...} instead of "video"')
        if not os.path.isabs(path):
            path = os.path.join(self.paths.videos_dir, path)
        for ext in (".mp4", ".npy"):
            if path.endswith(ext):
                path = path[: -len(ext)]
        raw = _decode_video(path)
        with self._rng_lock:
            frames, v_len = subsample_frames(raw, self.rng)
        return frames.astype(np.uint8), v_len

    def load_example(self, name):
        """Cached-features mode: 1-of-4 subsample of the stored feature
        planes for one packed example (same pick semantics as the loaders,
        eval/dataset.py:80-89, but dtype-preserving)."""
        if self.feature_loader is None:
            raise ValueError('this server decodes videos — '
                             'POST {"video": "<path>", ...} instead of "example"')
        if name not in self.id_to_idx:
            raise ValueError(f"unknown example id {name!r}")
        idx = self.id_to_idx[name]
        with self._decode_lock:
            if idx in self._example_cache:
                self._example_cache.move_to_end(idx)
                raw = self._example_cache[idx]
            else:
                raw = self.feature_loader.example_frames(idx)
                if self._example_cache_size:
                    self._example_cache[idx] = raw
                    while len(self._example_cache) > self._example_cache_size:
                        self._example_cache.popitem(last=False)
        with self._rng_lock:
            return subsample_frames(raw, self.rng, dtype=raw.dtype)

    def run_batch(self, items):
        """items: list of (frames [35, *frame_shape], v_len, tokens). Returns
        [n, num_classes] probabilities (padding rows dropped). frame_shape /
        dtype are [H,W,3] u8 pixels normally, [10,13,512] bf16/fp8 feature
        planes under --feature_cache."""
        probs, n, fetched = self.dispatch_batch(items)
        return probs if fetched else np.asarray(probs)[:n]

    def dispatch_batch(self, items):
        """Stage + transfer + ENQUEUE the forward without forcing the result:
        returns ``(probs, n, fetched)`` where ``probs`` is a device array the
        caller materializes later with ``np.asarray(probs)[:n]`` (jax
        dispatch is asynchronous, so the device computes while the caller
        stages the next batch — the MicroBatcher's pipeline). ``fetched`` is
        True only for an int8-calibration batch, which must complete
        synchronously (its new state commits under the weights lock) and so
        already returns trimmed host probabilities."""
        n = len(items)
        B = self.B
        # bucket-size the staging buffer up front: the host memcpy and the
        # transfer both scale with the trimmed time axis, not just the FLOPs
        t_b = self.bucket_for(max(max(vl, 1) for _, vl, _ in items))
        video = np.zeros((B, t_b, *self.frame_shape), self.frame_dtype)
        question = np.zeros((B, C.MAX_Q_LEN), np.int32)
        v_len = np.ones(B, np.int32)
        q_len = np.ones(B, np.int32)
        for i, (frames, vl, tokens) in enumerate(items):
            t_i = min(frames.shape[0], t_b)
            video[i, :t_i] = frames[:t_i]
            question[i, :len(tokens)] = tokens
            v_len[i] = max(vl, 1)
            q_len[i] = max(len(tokens), 1)
        if self.mesh is not None:
            put = lambda v: jax.device_put(v, self._batch_spec(v))
        else:
            put = jnp.asarray
        with self._weights_lock:
            # one load: a concurrent micro-batch runs entirely on one
            # (params, state) tuple, immune to hot-reload swaps
            params, state = self._weights
            version = self._weights_version
            calibrate = self._needs_int8_calibration
        if calibrate:
            probs, new_state = self._forward_calibrate(
                params, state, put(video), put(question), put(v_len),
                put(q_len))
            with self._weights_lock:
                if self._weights_version == version:
                    self._weights = (params, new_state)  # carries int8_scales
                    self._needs_int8_calibration = False
                # else: a hot reload swapped the weights mid-calibration —
                # discard this calibration (it belongs to the OLD weights)
                # and leave the flag set so the next batch calibrates the
                # new checkpoint
            return np.asarray(probs)[:n], n, True
        probs = self._forward(params, state, put(video),
                              put(question), put(v_len), put(q_len))
        return probs, n, False

    def bucket_for(self, v_len):
        """Smallest frame bucket covering ``v_len`` (35 when unbucketed)."""
        if not self.frame_buckets:
            return C.MAX_ALLOWED_NUM_FRAMES_DROPPING
        return min((t for t in self.frame_buckets if t >= max(v_len, 1)),
                   default=C.MAX_ALLOWED_NUM_FRAMES_DROPPING)

    def warmup(self):
        """Precompile every serving shape (one per frame bucket, or the one
        35-frame shape) so first requests hit warm executables.

        With --int8_trunk, the int8 calibration pass runs FIRST so the
        bucket executables compile in their final static-scale form
        (calibration adds a state key; compiling before it would leave every
        warm executable stale). In cached mode it calibrates on a real
        stored example. In video mode there are no representative pixels at
        hand — the zero warmup frames are a BLACK video whose stem
        activations sit far below real traffic's, so scales calibrated on
        them would hard-clip every conv at +-127 and silently serve garbage.
        Instead, video mode calibrates provisionally on random pixels at
        every bucket (warming the calibration executables too) and then
        RE-ARMS, so the first real micro-batch replaces the provisional
        scales with traffic-derived ones on a warm executable."""
        lengths = (list(self.frame_buckets) if self.frame_buckets
                   else [C.MAX_ALLOWED_NUM_FRAMES_DROPPING])
        video_int8_cal = (self._needs_int8_calibration
                          and self.feature_loader is None)
        if self._needs_int8_calibration and self.feature_loader is not None:
            frames, vl = self.load_example(min(self.id_to_idx))
            self.run_batch([(frames, vl, [1])])
        elif video_int8_cal:
            rnd = self.rng.randint(
                0, 256, size=(C.MAX_ALLOWED_NUM_FRAMES_DROPPING,
                              *self.frame_shape)).astype(self.frame_dtype)
            for t in lengths:
                with self._weights_lock:
                    self._needs_int8_calibration = True
                self.run_batch([(rnd, t, [1])])
        frames = np.zeros((C.MAX_ALLOWED_NUM_FRAMES_DROPPING,
                           *self.frame_shape), self.frame_dtype)
        for t in lengths:
            self.run_batch([(frames, t, [1])])
        if video_int8_cal:
            with self._weights_lock:
                self._needs_int8_calibration = True


class MicroBatcher:
    """Collects concurrent requests into one forward call.

    With frame buckets, dispatch is BUCKET-AWARE: a mixed batch pays for its
    longest member (the batch shape is the max v_len's bucket). When the
    backlog is deep enough that the OLDEST request's bucket can FILL a
    batch, the worker dispatches that bucket pure and carries the rest —
    under saturation, batches become bucket-pure and short videos stop
    subsidizing long ones. When it can't fill one, the batch dispatches
    mixed exactly as without buckets: every forward is full-shape work
    regardless of fill, so splitting an underfull batch only multiplies
    fixed costs (measured 9.5 -> 2.6 videos/s on the sandbox load bench
    before this fill guard). Oldest-first keeps every request progressing
    (its group is dispatched or at the front next round)."""

    def __init__(self, engine, batch_wait_ms=5.0, max_pending=512,
                 pipeline_depth=1):
        """``pipeline_depth`` bounds dispatched-but-unfetched micro-batches.
        At depth >= 2 the worker hands the (asynchronously dispatched)
        forward to a completion thread and immediately stages the next batch
        — host memcpy + host->device transfer of batch N+1 overlap device
        compute of batch N (jax dispatch returns before the device runs).
        Depth 1 is the fully synchronous loop; each extra unit of depth pins
        one more staged batch in host+device memory."""
        self.engine = engine
        self.wait_s = batch_wait_ms / 1e3
        self.max_pending = max_pending
        self.q = queue.Queue()
        self._carry = []
        self._outstanding = 0
        self.stats = {"requests": 0, "batches": 0, "errors": 0,
                      "deferred": 0, "rejected": 0, "forward_s": 0.0}
        # end-to-end request latencies (submit -> response), last 1024:
        # enough for steady p50/p95 without unbounded growth
        self._latencies = collections.deque(maxlen=1024)
        self._lock = threading.Lock()
        self._cq = None
        if pipeline_depth > 1:
            self._cq = queue.Queue()
            self._inflight = threading.Semaphore(pipeline_depth)
            self._completer = threading.Thread(target=self._complete,
                                               daemon=True)
            self._completer.start()
        self._worker = threading.Thread(target=self._loop, daemon=True)
        self._worker.start()

    def submit(self, frames, v_len, tokens):
        """Blocking: returns this request's probability vector. Raises
        Overloaded past ``max_pending`` outstanding requests — shedding load
        beats growing the queue (each queued item pins MBs of frames) until
        the host OOMs with /healthz still green."""
        with self._lock:
            if self._outstanding >= self.max_pending:
                self.stats["rejected"] += 1
                raise Overloaded(
                    f"{self._outstanding} requests already pending")
            self._outstanding += 1
        try:
            t0 = time.monotonic()
            done = threading.Event()
            slot = {}
            self.q.put(((frames, v_len, tokens), slot, done))
            done.wait()
            if "error" in slot:
                raise slot["error"]
            with self._lock:
                self._latencies.append(time.monotonic() - t0)
            return slot["probs"]
        finally:
            with self._lock:
                self._outstanding -= 1

    def pending(self):
        """Outstanding requests: queued, carried, AND inside a running
        forward — so the graceful drain waits for work the worker has
        already dequeued, not just the queue."""
        return self._outstanding

    def _loop(self):
        import time as _time

        while True:
            B = self.engine.B
            batch = self._carry
            self._carry = []
            if not batch:
                batch = [self.q.get()]
            # absolute deadline: the batch dispatches within wait_s of the
            # FIRST request (per-get timeouts would stretch the window to
            # (B-1)*wait_s under a trickle of arrivals)
            deadline = _time.monotonic() + self.wait_s
            while len(batch) < B:
                remaining = deadline - _time.monotonic()
                if remaining <= 0:
                    break
                try:
                    batch.append(self.q.get(timeout=remaining))
                except queue.Empty:
                    break
            # at saturation, look past B into the backlog (free: already
            # queued) so a bucket group has a chance to fill a whole batch
            if self.engine.frame_buckets:
                while len(batch) < 4 * B:
                    try:
                        batch.append(self.q.get_nowait())
                    except queue.Empty:
                        break
                key = self.engine.bucket_for(batch[0][0][1])
                same = [r for r in batch
                        if self.engine.bucket_for(r[0][1]) == key]
                if len(same) >= B:
                    # the oldest request's bucket fills a batch: go pure
                    dispatch = same[:B]
                    picked = set(map(id, dispatch))
                    self._carry = [r for r in batch
                                   if id(r) not in picked]
                else:
                    # can't fill: one mixed batch (splitting underfull
                    # batches only multiplies fixed per-forward costs)
                    dispatch, self._carry = batch[:B], batch[B:]
                if self._carry:
                    with self._lock:
                        for _, slot, _ in self._carry:
                            # count each request once, not once per round
                            if not slot.get("_deferred"):
                                slot["_deferred"] = True
                                self.stats["deferred"] += 1
                batch = dispatch
            items = [b[0] for b in batch]
            t0 = _time.time()
            if self._cq is None:  # pipeline_depth 1: fully synchronous
                try:
                    probs = self.engine.run_batch(items)
                except Exception as e:
                    self._fail(batch, e)
                else:
                    self._settle(batch, probs, t0)
                continue
            # pipelined: the forward is dispatched (asynchronously — jax
            # returns before the device runs) and handed to the completion
            # thread; this loop goes straight back to staging the next
            # batch. The semaphore bounds dispatched-but-unfetched batches.
            self._inflight.acquire()
            try:
                handle = self.engine.dispatch_batch(items)
            except Exception as e:
                self._inflight.release()
                self._fail(batch, e)
            else:
                self._cq.put((batch, handle, t0))

    def _settle(self, batch, probs, t0):
        """Deliver one micro-batch's probabilities to its waiters."""
        import time as _time

        for i, (_, slot, done) in enumerate(batch):
            slot["probs"] = probs[i]
            done.set()
        with self._lock:
            self.stats["requests"] += len(batch)
            self.stats["batches"] += 1
            self.stats["forward_s"] += _time.time() - t0

    def _fail(self, batch, e):
        """Surface one failure to every waiter in the batch."""
        for _, slot, done in batch:
            slot["error"] = e
            done.set()
        with self._lock:
            self.stats["errors"] += len(batch)

    def _complete(self):
        """Completion side of the pipeline: force each dispatched forward
        (device fetch) and deliver it, in dispatch order. Fetch errors
        (XLA runtime failures surface at materialization when dispatch is
        asynchronous) land on the batch's waiters like dispatch errors."""
        while True:
            batch, (probs, n, fetched), t0 = self._cq.get()
            try:
                arr = probs if fetched else np.asarray(probs)[:n]
            except Exception as e:
                self._fail(batch, e)
            else:
                self._settle(batch, arr, t0)
            finally:
                self._inflight.release()


def make_handler(engine, batcher):
    from http.server import BaseHTTPRequestHandler

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _read_json(self, default=None):
            """Request body as a dict; ValueError (-> 400) on anything else
            (a non-dict body like ``[1,2]`` parses as valid JSON but would
            TypeError on req["question"], dropping the connection with no
            response)."""
            n = int(self.headers.get("Content-Length", 0))
            if not n and default is not None:
                return default
            req = json.loads(self.rfile.read(n))
            if not isinstance(req, dict):
                raise ValueError("request body must be a JSON object")
            return req

        def _stats(self):
            with batcher._lock:
                s = dict(batcher.stats)
                lats = list(batcher._latencies)
            s["avg_batch"] = (s["requests"] / s["batches"]
                              if s["batches"] else 0.0)
            s["avg_forward_ms"] = (s["forward_s"] / s["batches"] * 1e3
                                   if s["batches"] else 0.0)
            # end-to-end request latency (submit -> response) over the
            # last <=1024 requests
            if lats:
                q = np.quantile(lats, [0.5, 0.95, 0.99])
                s["latency_p50_ms"] = float(q[0]) * 1e3
                s["latency_p95_ms"] = float(q[1]) * 1e3
                s["latency_p99_ms"] = float(q[2]) * 1e3
            # weight-swap observability: which weights are serving and
            # whether int8 scales are armed to (re)calibrate
            with engine._weights_lock:
                s["weights_version"] = engine._weights_version
                s["int8_calibration_pending"] = \
                    engine._needs_int8_calibration
            if getattr(engine, "stem_fingerprint_hex", None):
                s["stem_fingerprint"] = engine.stem_fingerprint_hex
            s["pending"] = batcher.pending()
            return s

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, {"ok": True, "pending": batcher.pending(),
                                 "epoch": engine.epoch})
            elif self.path == "/stats":
                self._send(200, self._stats())
            elif self.path == "/metrics":
                # Prometheus text exposition of the same stats, so the
                # daemon scrapes into a standard monitoring stack
                s = self._stats()
                lines = []

                def metric(name, kind, value):
                    lines.append(f"# TYPE videonavqa_{name} {kind}")
                    lines.append(f"videonavqa_{name} {value}")

                metric("requests_total", "counter", s["requests"])
                metric("batches_total", "counter", s["batches"])
                metric("errors_total", "counter", s["errors"])
                metric("rejected_total", "counter", s["rejected"])
                metric("deferred_total", "counter", s["deferred"])
                metric("forward_seconds_total", "counter", s["forward_s"])
                metric("pending_requests", "gauge", s["pending"])
                metric("avg_batch_size", "gauge", s["avg_batch"])
                metric("weights_version", "gauge", s["weights_version"])
                lines.append(
                    "# TYPE videonavqa_request_latency_seconds summary")
                for p in ("50", "95", "99"):
                    v = s.get(f"latency_p{p}_ms")
                    if v is not None:
                        lines.append(
                            'videonavqa_request_latency_seconds'
                            '{quantile="0.%s"} %g' % (p, v / 1e3))
                body = ("\n".join(lines) + "\n").encode()
                self.send_response(200)
                self.send_header("Content-Type",
                                 "text/plain; version=0.0.4")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self._send(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path == "/reload":
                # hot weight swap: {"checkpoint_path": "..."} (optional —
                # default re-reads the startup checkpoint, e.g. after a
                # trainer overwrote it). In-flight batches finish on the old
                # weights; the next micro-batch serves the new ones.
                try:
                    req = self._read_json(default={})
                    epoch = engine.reload(req.get("checkpoint_path"))
                    self._send(200, {"ok": True, "epoch": epoch})
                except Exception as e:
                    # a reload must always answer: a corrupt/mismatched
                    # checkpoint (torch UnpicklingError, shape mismatch,
                    # BadZipFile, ...) leaves the old weights serving
                    self._send(400, {"error": str(e)})
                return
            if self.path != "/predict":
                self._send(404, {"error": "unknown path"})
                return
            try:
                req = self._read_json()
                tokens = engine.encode_question(req["question"])
                if "example" in req:
                    frames, v_len = engine.load_example(req["example"])
                else:
                    frames, v_len = engine.load_video(req["video"])
            except (ValueError, KeyError, OSError) as e:
                self._send(400, {"error": str(e)})
                return
            try:
                probs = batcher.submit(frames, v_len, tokens)
            except Overloaded as e:
                self._send(503, {"error": f"overloaded: {e}"})
                return
            except Exception as e:
                # an engine/XLA failure must yield a response, not a
                # silently-dropped connection
                self._send(500, {"error": f"inference failed: {e}"})
                return
            top = np.argsort(-probs)[:5]
            self._send(200, {
                "answer": CLASS_TO_ANSWER[int(top[0])],
                "top": [[CLASS_TO_ANSWER[int(i)], float(probs[i])]
                        for i in top],
            })

        def log_message(self, fmt, *a):  # quiet access log
            pass

    return Handler


def build_server(args):
    """(engine, batcher, ThreadingHTTPServer) — split out for tests."""
    from http.server import ThreadingHTTPServer

    from videonavqa_tpu.cli.common import _maybe_enable_compile_cache

    _maybe_enable_compile_cache(args)

    class Server(ThreadingHTTPServer):
        # stdlib default backlog is 5 — a burst of reconnecting clients
        # (urllib opens a fresh connection per request) gets refused under
        # load; deepen it to ride out micro-batch-sized bursts
        request_queue_size = 128
        daemon_threads = True

    engine = InferenceEngine(args)
    batcher = MicroBatcher(engine, batch_wait_ms=args.batch_wait_ms,
                           max_pending=getattr(args, "max_pending", 512),
                           pipeline_depth=getattr(args, "pipeline_depth", 2))
    server = Server((args.host, args.port), make_handler(engine, batcher))
    return engine, batcher, server


def main(argv=None):
    parser = build_q_and_v_parser()
    parser.add_argument("--host", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8808)
    parser.add_argument("--max_batch", type=int, default=8,
                        help="micro-batch cap; one fixed-shape executable")
    parser.add_argument("--batch_wait_ms", type=float, default=5.0,
                        help="wait this long after the first request for "
                             "more before dispatching the batch")
    parser.add_argument("--serve_split", type=str, default="test",
                        help="with --feature_cache: which split's feature "
                             "file to serve precomputed examples from")
    parser.add_argument("--example_cache", type=int, default=64,
                        help="with --feature_cache: LRU size (in examples) "
                             "for decoded feature planes (~19 MB each bf16); "
                             "0 disables")
    parser.add_argument("--max_pending", type=int, default=512,
                        help="shed load with 503 past this many outstanding "
                             "requests (each pins MBs of staged frames)")
    parser.add_argument("--pipeline_depth", type=int, default=2,
                        help="micro-batches in flight on the device: at >= 2 "
                             "the next batch's staging + host->device "
                             "transfer overlap the current batch's forward "
                             "(1 = synchronous; each unit pins one staged "
                             "batch in host+device memory)")
    parser.add_argument("--int8_stem_calibration_video", type=str,
                        default=None,
                        help="with --int8_stem (video mode): stored video to "
                             "calibrate the stem's activation scales on at "
                             "startup (default: first video in videos/)")
    parser.add_argument("--warmup", type=lambda s: s.lower() == "true",
                        default=True,
                        help="precompile every serving shape before "
                             "accepting traffic (one executable per frame "
                             "bucket under --bucket_frames)")
    args = parser.parse_args(argv)
    if not args.model:
        raise SystemExit("--model is required")
    if not args.checkpoint_path or not os.path.exists(args.checkpoint_path):
        raise SystemExit("--checkpoint_path is required for serving")

    engine, batcher, server = build_server(args)
    if getattr(args, "warmup", False):
        print("warming up serving executables...")
        engine.warmup()

    # graceful drain: SIGTERM/SIGINT stops accepting connections, lets
    # queued requests finish their micro-batches, then exits — a rolling
    # restart never drops accepted work
    import signal

    def _drain(signum, frame):
        print(f"signal {signum}: draining "
              f"{batcher.pending()} pending requests...")
        threading.Thread(target=server.shutdown, daemon=True).start()

    signal.signal(signal.SIGTERM, _drain)
    signal.signal(signal.SIGINT, _drain)

    print(f"serving {args.model} on http://{args.host}:{args.port} "
          f"(max_batch {args.max_batch}, pallas={engine.cfg.use_pallas_kernels}, "
          f"int8_trunk={engine.cfg.use_int8_trunk}, "
          f"int8_stem={engine.stem_is_int8}, "
          f"buckets={engine.frame_buckets or 'off'})")
    server.serve_forever()
    deadline = time.monotonic() + 30.0
    while batcher.pending() and time.monotonic() < deadline:
        time.sleep(0.05)
    time.sleep(1.0)  # let the last micro-batch's responses flush
    server.server_close()
    print("drained; bye")


if __name__ == "__main__":
    main()
