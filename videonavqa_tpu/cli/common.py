"""Shared harness logic for the CLI entry points.

Reproduces the flag surface and training semantics of the reference harnesses
(eval/q_and_v_eval.py, eval/q_only_eval.py, eval/v_only_*_eval.py and their
*_test counterparts) on the jitted TPU train/eval steps:

- per-epoch loop with running-loss prints every --stats_after_every iterations,
- torch-format epoch summary lines (loss normalized by example count, hits,
  weighted/micro F1),
- per-class accuracy dict printed for val/test (eval/q_and_v_eval.py:216-217),
- epoch-stamped checkpoints with optimizer state and train F1 metadata,
- MAC extras: elementwise grad clamp and the epoch-1 lr/10 dip (PARITY #18),
- test mode: last-batch padding + slicing, t_/p_/q_ prediction dumps.
"""

from __future__ import annotations

import argparse
import os
import pprint as pp
import time

import jax
import jax.numpy as jnp
import numpy as np

from videonavqa_tpu.data import BatchLoader, DataPaths, VNQADataset, load_json
from videonavqa_tpu.models import ModelConfig, get_model
from videonavqa_tpu.train import metrics as M
from videonavqa_tpu.train.step import (
    make_eval_step, make_optimizer, make_train_step, set_learning_rate,
)
from videonavqa_tpu.utils import checkpoint as ckpt
from videonavqa_tpu.utils import constants as C
from videonavqa_tpu.utils.logging import MetricsLogger, maybe_profile


def add_common_args(parser: argparse.ArgumentParser):
    parser.add_argument("--data_dir", type=str, default="../data/",
                        help="dataset root (replaces the hardcoded BASE_DIR, eval/utils.py:6)")
    parser.add_argument("--num_classes", type=int, default=C.NUM_CLASSES)
    parser.add_argument("--vocab_size", type=int, default=C.VOCAB_SIZE)
    parser.add_argument("--checkpoint_path", type=str)
    parser.add_argument("--num_workers", type=int, default=4)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--compute_dtype", type=str, default="bfloat16",
                        choices=["bfloat16", "float32"])
    parser.add_argument("--metrics_file", type=str, default=None,
                        help="JSONL metrics stream (structured counterpart of "
                             "the reference's stdout .log files)")
    parser.add_argument("--profile_dir", type=str, default=None,
                        help="write a jax.profiler trace of the first training "
                             "epoch here")
    parser.add_argument("--jax_cache_dir", type=str, default=None,
                        help="persistent XLA compilation cache directory "
                             "(first compiles are 20-40s; cached runs start "
                             "instantly)")
    parser.add_argument("--stochastic_eval", type=lambda s: s.lower() == "true",
                        default=False,
                        help="re-randomize frame subsampling at val/test time "
                             "like the reference (eval/dataset.py:80-89; "
                             "nondeterministic metrics — see PARITY.md #13)")
    parser.add_argument("--mesh_devices", type=int, default=0,
                        help="shard training/eval over an N-device "
                             "('data','model') mesh (GSPMD data parallelism; "
                             "0 = single device). The global batch_size must "
                             "divide by the 'data' axis; see PARALLEL.md")
    parser.add_argument("--model_parallel", type=int, default=1,
                        help="'model'-axis size within --mesh_devices (shards "
                             "the widest projections; parallel/mesh.py)")
    parser.add_argument("--distributed", type=lambda s: s.lower() == "true",
                        default=False,
                        help="multi-host: jax.distributed.initialize before "
                             "device use; --mesh_devices then counts GLOBAL "
                             "devices and each host's loader decodes only its "
                             "batch slice (parallel/multihost.py)")
    parser.add_argument("--coordinator_address", type=str, default=None,
                        help="host:port of process 0 (auto-detected on TPU "
                             "pods when omitted)")
    parser.add_argument("--num_processes", type=int, default=None)
    parser.add_argument("--process_id", type=int, default=None)
    return parser


def build_q_and_v_parser():
    """Flag surface of eval/q_and_v_eval.py:29-66."""
    parser = argparse.ArgumentParser()
    add_common_args(parser)
    parser.add_argument("--model", type=str,
                        choices=["concat2d", "concat3d", "film_gp_pt", "film_attn_pt",
                                 "mac", "time_multi_hop"])
    parser.add_argument("--q_encoder", type=str, choices=["lstm", "bow"], default="lstm")
    parser.add_argument("--use_obj_detector", type=lambda s: s.lower() != "false", default=True)
    parser.add_argument("--use_visual_features", type=lambda s: s.lower() != "false", default=True)
    parser.add_argument("--embed_size", type=int, default=128)
    parser.add_argument("--hidden_size", type=int, default=128)
    parser.add_argument("--at_hidden_size", type=int, default=128)
    parser.add_argument("--num_res_blocks", type=int, default=1)
    parser.add_argument("--num_res_block_channels", type=int, default=512)
    parser.add_argument("--num_input_channels", type=int, default=512)
    parser.add_argument("--num_tail_channels", type=int, default=16)
    parser.add_argument("--mac_dim", type=int, default=512)
    parser.add_argument("--mac_max_step", type=int, default=12)
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--clip_value", type=float, default=1.0)
    parser.add_argument("--l_rate", type=float, default=1e-4)
    parser.add_argument("--loss_reduction", type=str, default="mean",
                        choices=["sum", "mean", "elementwise_mean"])
    parser.add_argument("--num_epochs", type=int, default=1)
    parser.add_argument("--use_class_weights", type=lambda s: s.lower() == "true", default=False)
    parser.add_argument("--frcnn_pretrained_path", type=str)
    parser.add_argument("--stats_after_every", type=int, default=400)
    parser.add_argument("--val_only", type=lambda s: s.lower() == "true", default=False)
    parser.add_argument("--bucket_frames",
                        type=lambda s: "auto" if s.lower() == "auto"
                        else s.lower() == "true", default=False,
                        help="group length-similar videos per batch and trim the "
                             "frame axis to bucket sizes (exact; skips padding-"
                             "frame compute, one compile per bucket). 'auto' "
                             "picks the cost-optimal bucket edges for this "
                             "dataset's own length histogram (data.buckets)")
    parser.add_argument("--use_vnr", type=lambda s: s.lower() == "true", default=False,
                        help="feed batches through the native C++ VNR loader "
                             "({split}.vnr files; see cli.pack_dataset)")
    parser.add_argument("--int8_stem", type=lambda s: s.lower() == "true", default=False,
                        help="run the frozen stem in int8 (calibrated on the "
                             "first training batch; ~26%% faster stem on v5e, "
                             "~2%% feature error — validate accuracy before "
                             "paper-comparable runs)")
    parser.add_argument("--int8_stem_calibration", type=str, default="improved",
                        choices=["absmax", "improved"],
                        help="int8 stem calibration: 'improved' adds per-"
                             "input-channel equalization + bias correction "
                             "(stem/quant.py calibrate_stem_quant, ~1.5x "
                             "lower feature error); 'absmax' is the legacy "
                             "per-tensor absmax*1.1")
    parser.add_argument("--feature_cache", type=lambda s: s.lower() == "true", default=False,
                        help="precompute the frozen stem once per dataset "
                             "(cli.extract_features, features_{split}.fnr) and "
                             "train/eval the trunk on cached bf16 features — "
                             "skips the stem every epoch with bit-identical "
                             "features and unchanged per-epoch random frame "
                             "subsampling")
    parser.add_argument("--feature_dtype", type=str, default="bfloat16",
                        choices=["bfloat16", "float8_e4m3"],
                        help="storage dtype for --feature_cache (fp8 halves "
                             "cache disk + transfer; 0.32%% logit drift at "
                             "the flagship config, scripts/fp8_cache_parity.py)")
    parser.add_argument("--use_pallas_kernels", type=lambda s: s.lower() == "true",
                        default=None,
                        help="fused serving kernels on eval/test inference "
                             "paths (film re-encode, attn tail, masked LSTM; "
                             "kernels/). TPU only; 2.0x batch-1 serving, "
                             "+4%% batch-32 (PERF.md). Training steps are "
                             "unaffected (no custom VJP). Default off here; "
                             "cli.predict auto-enables on TPU")
    parser.add_argument("--int8_trunk", type=lambda s: s.lower() == "true",
                        default=False,
                        help="run FiLM trunk convs int8 on inference paths "
                             "(dynamic activation scales; 1.78x per conv on "
                             "v5e, PERF.md). Opt-in: introduces small logit "
                             "drift, validate task accuracy before "
                             "paper-comparable runs")
    return parser


def cfg_from_args(args, model_name):
    return ModelConfig(
        model=model_name,
        num_classes=args.num_classes,
        vocab_size=args.vocab_size,
        q_encoder=getattr(args, "q_encoder", "lstm"),
        embed_size=getattr(args, "embed_size", 128),
        hidden_size=getattr(args, "hidden_size", 128),
        at_hidden_size=getattr(args, "at_hidden_size", 128),
        num_res_blocks=getattr(args, "num_res_blocks", 1),
        num_res_block_channels=getattr(args, "num_res_block_channels", 512),
        num_input_channels=getattr(args, "num_input_channels", 512),
        num_tail_channels=getattr(args, "num_tail_channels", 16),
        mac_dim=getattr(args, "mac_dim", 512),
        mac_max_step=getattr(args, "mac_max_step", 12),
        compute_dtype=args.compute_dtype,
        use_pallas_kernels=bool(getattr(args, "use_pallas_kernels", None)),
        use_int8_trunk=bool(getattr(args, "int8_trunk", False)),
    )


def load_stem(args, paths: DataPaths, calibration_video=None, mesh=None):
    """Frozen stem params: imported from vgg16_caffe.pth / obj_detect.pt when
    available, else a seeded random init (synthetic-data runs).

    With --int8_stem and a calibration batch, returns the int8 stem
    (stem/quant.py); otherwise the bf16 stem."""
    from videonavqa_tpu.stem import init_obj_detector, init_vgg_partial, stem_features
    from videonavqa_tpu.utils import torch_import as ti

    key = jax.random.PRNGKey(1234)
    frcnn_path = getattr(args, "frcnn_pretrained_path", None)
    if frcnn_path and os.path.exists(frcnn_path):
        vgg_params = ti.import_vgg_partial(ti.load_torch_state_dict(frcnn_path, key=None))
    else:
        print("=> No VGG-16 weights found - using random frozen stem")
        vgg_params = init_vgg_partial(key)
    if os.path.exists(paths.obj_detector_file):
        det_params, det_state = ti.import_obj_detector(
            ti.load_torch_state_dict(paths.obj_detector_file))
    else:
        print("=> No obj_detect.pt found - using random object detector")
        det_params, det_state = init_obj_detector(key)

    if getattr(args, "int8_stem", False) and calibration_video is not None:
        from videonavqa_tpu.stem.quant import (
            calibrate_act_scales, calibrate_stem_quant, quantize_stem,
            stem_features_int8,
        )

        mode = getattr(args, "int8_stem_calibration", "improved")
        print(f"=> Calibrating int8 stem on one batch ({mode})")
        # calibration runs EAGER reductions — keep everything single-device
        # here (eager collectives over a mesh-replicated stem deadlock the
        # CPU all-reduce rendezvous), then mesh-place the quantized result
        calib = jax.device_put(calibration_video, jax.devices()[0])
        if mode == "improved":
            scales = calibrate_stem_quant(vgg_params, det_params, det_state,
                                          calib)
        else:
            scales = calibrate_act_scales(vgg_params, det_params, det_state,
                                          calib)
        qstem = quantize_stem(vgg_params, det_params, act_scales=scales)
        if mesh is not None:
            from videonavqa_tpu.parallel import replicate

            qstem = replicate(qstem, mesh)
            det_params = replicate(det_params, mesh)
            det_state = replicate(det_state, mesh)

        def stem_fn(video):
            return stem_features_int8(qstem, det_params, det_state, video)

        return stem_fn

    if mesh is not None:
        # the stem is closed over by the jitted step as a constant — under a
        # mesh its arrays must be mesh-placed (replicated), not single-device
        from videonavqa_tpu.parallel import replicate

        vgg_params = replicate(vgg_params, mesh)
        det_params = replicate(det_params, mesh)
        det_state = replicate(det_state, mesh)

    # the stem follows --compute_dtype (bfloat16 default on TPU; tests pass
    # float32, which is also much faster on CPU where bf16 is emulated)
    stem_dtype = jnp.dtype(getattr(args, "compute_dtype", "bfloat16"))

    def stem_fn(video):
        return stem_features(vgg_params, det_params, det_state, video,
                             dtype=stem_dtype)

    return stem_fn


def mac_lr_for_epoch(l_rate: float, epoch: int) -> float:
    """Reference MAC schedule (q_and_v_eval.py:358-364): the "warmup" lr/10 is
    assigned AFTER epoch-0 training, so epoch 0 trains at full lr, epoch 1 at
    lr/10, and epochs >= 2 back at full lr. Replicated exactly (PARITY #18)
    even though assigning warmup post-epoch-0 looks unintended."""
    return l_rate / 10.0 if epoch == 1 else l_rate


def _np_local_rows(arr):
    """Host-local rows of a (possibly cross-host batch-sharded) array."""
    if getattr(arr, "is_fully_addressable", True):
        return np.asarray(arr)
    shards = sorted(arr.addressable_shards,
                    key=lambda s: s.index[0].start or 0)
    return np.concatenate([np.asarray(s.data) for s in shards])


def _gather_across_hosts(*arrays):
    """Concatenate every host's (ragged) 1-D int arrays in process order.
    Pads with a -1 sentinel to a common length for process_allgather; values
    must be >= 0 (labels/predictions/q_ids are)."""
    from jax.experimental import multihost_utils as mhu

    n_local = np.int64(len(arrays[0]))
    max_n = int(np.max(np.asarray(mhu.process_allgather(n_local))))

    def one(a):
        a = np.asarray(a, np.int64)
        # the -1 pad is stripped by sign below — a negative *value* would be
        # silently dropped and desynchronize y_pred/y_target, so reject it
        assert np.all(a >= 0), "gathered arrays must be non-negative"
        pad = np.full(max_n, -1, np.int64)
        pad[:len(a)] = a
        g = np.asarray(mhu.process_allgather(pad)).reshape(-1)
        return g[g >= 0]

    return tuple(one(a) for a in arrays)


def _failure_sentinel(path):
    return path + ".failed"


# sentinels older than this process are leftovers of a PREVIOUS failed run:
# on a restart, non-zero hosts reach _await_artifacts in milliseconds while
# process 0 is still minutes away from the _artifact_guard that clears them
# (hashing stem weights etc.) — honoring them would crash every healthy
# restart. 120 s of slack absorbs cross-host clock skew on the shared fs.
_RUN_START = time.time()


def _sentinel_is_live(path):
    try:
        return os.path.getmtime(path) >= _RUN_START - 120.0
    except OSError:
        return False


class _artifact_guard:
    """Process-0 context for one-time artifact writes: on exception it drops a
    ``<path>.failed`` sentinel next to each artifact so waiting hosts fail
    fast instead of polling out their full timeout; on entry it clears stale
    sentinels from a previous failed run."""

    def __init__(self, paths):
        self.paths = list(paths)
        for p in self.paths:
            if os.path.exists(_failure_sentinel(p)):
                os.remove(_failure_sentinel(p))

    def __enter__(self):
        return self

    def __exit__(self, exc_type, exc, tb):
        if exc_type is not None:
            for p in self.paths:
                try:
                    with open(_failure_sentinel(p), "w") as f:
                        f.write(f"{exc_type.__name__}: {exc}\n")
                except OSError:
                    pass
        return False


def _await_artifacts(paths, timeout=3600, ready=None):
    """Multi-host 'barrier' for one-time disk artifacts written by process 0:
    the other hosts poll for the files on the shared filesystem (which the
    dataset requires anyway). A device-collective barrier would be wrong
    here — Gloo/ICI handshakes time out (~30 s) while process 0 spends
    minutes packing/extracting without participating. Writers are atomic
    (os.replace), so existence == complete; ``ready`` overrides the
    completion predicate (e.g. fingerprint match for re-extracted caches).
    A ``<path>.failed`` sentinel (written by _artifact_guard when the writer
    raises) aborts the wait immediately."""
    if jax.process_index() == 0:
        return
    if ready is None:
        ready = os.path.exists
    t0 = time.time()
    for p in paths:
        while not ready(p):
            if _sentinel_is_live(_failure_sentinel(p)):
                with open(_failure_sentinel(p)) as f:
                    reason = f.read().strip()
                raise RuntimeError(
                    f"process 0 failed while writing {p}: {reason}")
            if time.time() - t0 > timeout:
                raise TimeoutError(f"waiting for process 0 to write {p}")
            time.sleep(1.0)


def _extract_features_once(args, h, splits):
    """Feature-cache files, extracted by process 0 only (others wait)."""
    from videonavqa_tpu.cli.extract_features import (
        ensure_features, feature_file, features_needed,
    )

    dtype = getattr(args, "feature_dtype", "bfloat16") or "bfloat16"
    if jax.process_index() == 0:
        # load the stem only if a cache is actually missing or stale
        # (fingerprint mismatch vs the stem these args resolve to), and load
        # it process-local: a jit over the mesh-replicated stem would require
        # every process's participation (SPMD)
        missing = features_needed(args, h.paths, splits, quiet=True)
        stem_fn = load_stem(args, h.paths) if missing else None
        outs = [feature_file(args.data_dir, s, dtype) for s in splits]
        with _artifact_guard(outs):
            files = ensure_features(args, stem_fn, splits, h.split)
    else:
        # wait for existence AND a matching stem fingerprint: a stale cache
        # may exist while process 0 is still re-extracting it (atomic
        # os.replace), so existence alone is not "ready" here
        from videonavqa_tpu.cli.extract_features import stem_fingerprint
        from videonavqa_tpu.data.vnr import read_fingerprint

        files = {s: feature_file(args.data_dir, s, dtype) for s in splits}
        want = stem_fingerprint(args, h.paths)
        done = lambda p: os.path.exists(p) and read_fingerprint(p) == want
        _await_artifacts(files.values(), ready=done)
    return files


def host_localize_batch(np_batch, global_batch_size):
    """Slice a full global numpy batch down to this host's rows (python-
    loader path under multi-host; the VNR loader instead decodes only its
    rows natively via row_slice). num_valid becomes host-local."""
    from videonavqa_tpu.parallel.multihost import host_batch_slice

    start, per = host_batch_slice(global_batch_size)
    g_valid = int(np_batch["num_valid"])
    out = {k: (v[start:start + per]
               if np.ndim(v) >= 1 and np.shape(v)[0] == global_batch_size else v)
           for k, v in np_batch.items() if k != "num_valid"}
    out["num_valid"] = np.int32(np.clip(g_valid - start, 0, per))
    return out


def prepare_batch(batch, mesh=None):
    """numpy -> device (videos stay uint8: 4x less transfer, the /255
    normalization runs in-graph via ops.video.normalize_video); attach a
    validity mask excluding test-mode padding rows from the loss. With a
    mesh, every leaf shards its batch dim over 'data' (GSPMD DP); with
    multiple processes, the batch rows are host-local and the global array is
    assembled from each host's shard."""
    num_valid = int(batch.pop("num_valid"))
    batch = {k: v for k, v in batch.items() if k != "q_id"}
    B = batch["label"].shape[0]
    if mesh is not None and jax.process_count() > 1:
        from videonavqa_tpu.parallel.multihost import global_batch_from_host_shards

        # always include the mask: the jit signature (pytree structure) must
        # match across hosts even when only one host holds padding rows
        batch["valid"] = np.arange(B) < num_valid
        batch = {k: np.asarray(v) for k, v in batch.items()}
        return global_batch_from_host_shards(mesh, batch), num_valid
    if num_valid < B:
        batch["valid"] = np.arange(B) < num_valid
    if mesh is not None:
        from videonavqa_tpu.parallel import batch_sharding

        spec = batch_sharding(mesh)
        batch = {k: jax.device_put(v, spec(v)) for k, v in batch.items()}
    else:
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
    return batch, num_valid


def _maybe_enable_compile_cache(args):
    cache_dir = getattr(args, "jax_cache_dir", None)
    if cache_dir:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


class Harness:
    def __init__(self, args, model_name, *, q_only=False, v_only=False,
                 clip_value=None, use_stem=None):
        _maybe_enable_compile_cache(args)
        self.args = args
        self.paths = DataPaths(args.data_dir)
        self.spec = get_model(model_name)
        self.cfg = cfg_from_args(args, model_name)
        self.q_only, self.v_only = q_only, v_only
        self.clip_value = clip_value
        self.elementwise_clamp = 1.0 if model_name == "mac" else None
        self.model_name = model_name

        split = load_json(self.paths.split_file)
        labels = load_json(self.paths.labels_file)
        self.split, self.labels = split, labels

        # GSPMD mesh (PARALLEL.md): 0 devices = the reference's single-device
        # behavior; N shards batches over 'data' and (optionally) the widest
        # projections over 'model'.
        if getattr(args, "distributed", False):
            from videonavqa_tpu.parallel import multihost

            multihost.initialize(getattr(args, "coordinator_address", None),
                                 getattr(args, "num_processes", None),
                                 getattr(args, "process_id", None),
                                 expect_multiprocess=True)
        self.mesh = None
        n_mesh = getattr(args, "mesh_devices", 0) or 0
        if n_mesh:
            from videonavqa_tpu.parallel import make_mesh

            mp = getattr(args, "model_parallel", 1)
            if jax.process_count() > 1 and getattr(args, "int8_stem", False):
                raise SystemExit(
                    "--int8_stem calibration is not supported multi-host; "
                    "use the bf16 stem or --feature_cache")
            self.mesh = make_mesh(n_mesh, model_parallel=mp)
            data_size = self.mesh.shape["data"]
            if args.batch_size % data_size:
                raise SystemExit(
                    f"--batch_size {args.batch_size} must divide by the "
                    f"'data' mesh axis ({data_size})")
            if args.batch_size % max(jax.process_count(), 1):
                raise SystemExit(
                    f"--batch_size {args.batch_size} must divide by the "
                    f"process count ({jax.process_count()})")
        # multi-host: each host's loader decodes only its slice of the batch
        self.row_slice = None
        if self.mesh is not None and jax.process_count() > 1:
            from videonavqa_tpu.parallel.multihost import host_batch_slice

            self.row_slice = host_batch_slice(args.batch_size)

        self.stem_fn = None
        self.needs_stem = (self.spec.uses_stem if use_stem is None else use_stem) \
            and getattr(args, "use_visual_features", True)
        # --feature_cache never runs the stem in-step; extraction (if any
        # cache file is missing) loads its own process-local stem lazily
        skip_for_cache = getattr(args, "feature_cache", False) \
            and self.needs_stem and not q_only
        if self.needs_stem and not getattr(args, "int8_stem", False) \
                and not skip_for_cache:
            self.stem_fn = load_stem(args, self.paths, mesh=self.mesh)
        # int8 stems are built lazily once a calibration batch is available
        # (see run_training / run_test)

        self.class_weights = None
        self.reduction = getattr(args, "loss_reduction", "mean") or "mean"
        self.metrics = MetricsLogger(
            getattr(args, "metrics_file", None),
            run_meta={"model": model_name, "args": vars(args)})

    def dataset(self, part, *, q_metadata=False, deterministic=False):
        if getattr(self.args, "stochastic_eval", False):
            deterministic = False  # faithful reference eval (PARITY.md #13)
        return VNQADataset(
            self.paths, self.split[part], self.labels, q_only=self.q_only,
            v_only=self.v_only, q_metadata=q_metadata,
            deterministic=deterministic, seed=self.args.seed)

    def init_model(self):
        key = jax.random.PRNGKey(self.args.seed)
        return self.spec.init(key, self.cfg)

    def shard_model(self, params, state, opt_state=None):
        """Place the train state on the mesh (no-op single-device): params
        replicate (or shard their widest projections over 'model'), BN state
        replicates, Adam mu/nu follow the params (PARALLEL.md)."""
        if self.mesh is None:
            return params, state, opt_state
        from videonavqa_tpu.parallel import (
            opt_state_shardings, param_shardings, put_global, replicate,
        )

        # put_global handles both topologies: plain device_put single-
        # controller, make_array_from_callback assembly from the identical
        # host copies (same seed / same checkpoint file) multi-controller —
        # including 'model'-sharded leaves that span hosts, whose checkpoint
        # save all-gathers them back (utils/checkpoint._np_global)
        p_shard = param_shardings(params, self.mesh)
        params = put_global(params, p_shard)
        state = replicate(state, self.mesh)
        if opt_state is not None:
            opt_state = put_global(
                opt_state,
                opt_state_shardings(opt_state, params, p_shard, self.mesh))
        return params, state, opt_state

    def run_epoch(self, step_fn, params, state, opt_state, loader, epoch, *,
                  train, rng):
        from videonavqa_tpu.data.prefetch import device_prefetch, host_prefetch

        t0 = time.time()
        total_loss, hit, num_examples = 0.0, 0, 0
        y_pred, y_target = [], []

        multihost = self.mesh is not None and jax.process_count() > 1

        def prepare(np_batch):
            if multihost and np.shape(np_batch["label"])[0] == self.args.batch_size:
                # python-loader path: full global batch -> this host's rows
                # (the VNR loaders already decode only their row_slice)
                np_batch = host_localize_batch(np_batch, self.args.batch_size)
            labels_np = np_batch["label"]
            batch, num_valid = prepare_batch(np_batch, mesh=self.mesh)
            return batch, num_valid, labels_np

        pending = None  # metrics fetched one step late so device work pipelines

        def drain(pending):
            nonlocal total_loss, hit, num_examples
            metrics, num_valid, labels_np = pending
            preds = _np_local_rows(metrics["preds"])[:num_valid]
            total_loss += float(metrics["loss"])
            hit += int(np.sum(preds == labels_np[:num_valid]))
            num_examples += num_valid
            y_pred.append(preds)
            y_target.append(labels_np[:num_valid])

        # stay one host->HBM transfer ahead of the running step
        for i, (batch, num_valid, labels_np) in enumerate(
                device_prefetch(host_prefetch(loader.epoch(epoch)), prepare)):
            rng, sub = jax.random.split(rng)
            if train:
                params, state, opt_state, metrics = step_fn(
                    params, state, opt_state, batch, sub)
            else:
                metrics = step_fn(params, state, batch, sub)
            if pending is not None:
                drain(pending)
            pending = (metrics, num_valid, labels_np)
            if train and (i + 1) % self.args.stats_after_every == 0:
                # metrics["loss"] is global (GSPMD over the full batch) while
                # num_examples counts only this host's rows mid-epoch
                denom = max(num_examples * (jax.process_count() if multihost else 1), 1)
                print("Average loss after %d iterations in epoch %d: %.6f"
                      % (i + 1, epoch + 1, total_loss / denom))
                self.metrics.log("train_progress", epoch=epoch, iteration=i + 1,
                                 avg_loss=total_loss / denom)
        if pending is not None:
            drain(pending)

        y_pred = np.concatenate(y_pred) if y_pred else np.array([])
        y_target = np.concatenate(y_target) if y_target else np.array([])
        if multihost:
            # global metrics: gather every host's (ragged) predictions. The
            # per-batch loss is already global (GSPMD sum over the full
            # batch); hits/examples/F1 need the union of host-local rows.
            y_pred, y_target = _gather_across_hosts(y_pred, y_target)
            hit = int(np.sum(y_pred == y_target))
            num_examples = int(len(y_pred))
        f1_w = M.f1_score(y_target, y_pred, average="weighted")
        f1_micro = M.f1_score(y_target, y_pred, average="micro")
        summary = {
            "loss": total_loss / max(num_examples, 1), "hit": hit,
            "num_examples": num_examples, "f1_w": f1_w, "f1_micro": f1_micro,
            "y_pred": y_pred, "y_target": y_target,
            "examples_per_sec": num_examples / max(time.time() - t0, 1e-9),
        }
        self.metrics.log("train_epoch" if train else "eval_epoch", epoch=epoch,
                         loss=summary["loss"], accuracy=hit / max(num_examples, 1),
                         f1_w=f1_w, f1_micro=f1_micro,
                         examples_per_sec=summary["examples_per_sec"])
        return params, state, opt_state, summary, rng

    def print_val_summary(self, summary, *, header="Validation"):
        accs = M.per_class_accuracies(
            summary["y_target"], summary["y_pred"], self.cfg.num_classes)
        pp.pprint({i: accs[i] for i in np.nonzero(accs)[0].tolist()})
        print("{}:\tAverage loss: {:.6f}, Accuracy: {}/{}, F1: w{:.4f}, micro{:.4f}\n".format(
            header, summary["loss"], summary["hit"], summary["num_examples"],
            summary["f1_w"], summary["f1_micro"]))


def run_training(args, model_name, *, q_only=False, v_only=False, clip_value=None):
    h = Harness(args, model_name, q_only=q_only, v_only=v_only, clip_value=clip_value)
    train_ds = h.dataset("train")
    val_ds = h.dataset("val", deterministic=True)
    print("%d train examples, %d validation examples" % (len(train_ds), len(val_ds)))

    if getattr(args, "use_class_weights", False):
        h.class_weights = train_ds.get_class_weights(h.cfg.num_classes)
        print("Using class weights", h.class_weights)

    # (v_only_cnn3d included: the C3D trunk reproduces the full zero-padded
    # volume exactly from a trimmed batch via the zero-run splice,
    # models/v_only_cnn3d.py c3d_trunk_trimmed)
    bucket = getattr(args, "bucket_frames", False) and not q_only
    # frame_buckets spec for the loaders: "auto" = dataset-optimal DP edges
    fb_spec = "auto" if bucket == "auto" else (True if bucket else None)
    bucket = bool(bucket)
    stochastic = getattr(args, "stochastic_eval", False)
    if getattr(args, "feature_cache", False) and h.needs_stem and not q_only:
        # Frozen-stem feature cache: extract once (cli.extract_features), then
        # train/eval the trunk only — the stem never runs again this process.
        if getattr(args, "int8_stem", False):
            raise SystemExit("--feature_cache and --int8_stem are mutually "
                             "exclusive (the cache is extracted with the bf16 stem)")
        from videonavqa_tpu.data.vnr import VNRBatchLoader, ensure_built

        ensure_built()
        files = _extract_features_once(args, h, ("train", "val"))
        h.stem_fn, h.needs_stem = None, False
        vnr_kw = dict(seed=args.seed, bucket_by_length=bucket,
                      frame_buckets=fb_spec,
                      row_slice=h.row_slice)
        train_loader = VNRBatchLoader(files["train"], args.batch_size,
                                      shuffle=True, mode="train", **vnr_kw)
        val_loader = VNRBatchLoader(files["val"], args.batch_size,
                                    shuffle=False, mode="val",
                                    deterministic=not stochastic, **vnr_kw)
    elif getattr(args, "use_vnr", False) and not q_only:
        from videonavqa_tpu.data.vnr import VNRBatchLoader, ensure_built, pack_dataset

        ensure_built()
        vnr_kw = dict(seed=args.seed, bucket_by_length=bucket,
                      frame_buckets=fb_spec,
                      row_slice=h.row_slice)
        loaders = {}
        stochastic = getattr(args, "stochastic_eval", False)
        for part, det in (("train", False), ("val", not stochastic)):
            path = os.path.join(args.data_dir, f"{part}.vnr")
            if not os.path.exists(path) and jax.process_index() == 0:
                print(f"=> Packing {part} split into {path}")
                with _artifact_guard([path]):
                    pack_dataset(args.data_dir, path, h.split[part])
            _await_artifacts([path])
            loaders[part] = VNRBatchLoader(
                path, args.batch_size, shuffle=(part == "train"),
                mode=part, deterministic=det, **vnr_kw)
        train_loader, val_loader = loaders["train"], loaders["val"]
    else:
        loader_kw = dict(num_workers=args.num_workers, seed=args.seed,
                         bucket_by_length=bucket, frame_buckets=fb_spec)
        train_loader = BatchLoader(train_ds, args.batch_size, shuffle=True, **loader_kw)
        val_loader = BatchLoader(val_ds, args.batch_size, shuffle=False, mode="val",
                                 **loader_kw)

    if h.needs_stem and h.stem_fn is None:  # int8: calibrate on one batch
        first = next(iter(train_loader.epoch(0)))
        calib = jnp.asarray(first["video"]).astype(jnp.float32) / 255.0
        h.stem_fn = load_stem(args, h.paths, calibration_video=calib, mesh=h.mesh)

    params, state = h.init_model()
    optimizer = make_optimizer(args.l_rate)
    opt_state = optimizer.init(params)

    start_epoch = 0
    if args.checkpoint_path and os.path.exists(args.checkpoint_path):
        print("=> Restoring from checkpoint path %s" % args.checkpoint_path)
        params, state_r, opt_r, meta = ckpt.load_any_checkpoint(
            args.checkpoint_path, model_name=h.model_name, cfg=h.cfg,
            params_template=params, state_template=state,
            opt_template=opt_state)
        state = state_r if state_r is not None else state
        opt_state = opt_r if opt_r is not None else opt_state
        start_epoch = int(meta.get("epoch", -1)) + 1
        print("==> Restored checkpoint %s (epoch %d)" % (args.checkpoint_path, start_epoch))
    elif args.checkpoint_path:
        print("=> No checkpoint existent - will save the model here")

    params, state, opt_state = h.shard_model(params, state, opt_state)
    train_step = make_train_step(
        h.spec, h.cfg, optimizer, class_weights=h.class_weights,
        reduction=h.reduction, clip_value=clip_value,
        elementwise_clamp=h.elementwise_clamp, stem_fn=h.stem_fn)
    eval_step = make_eval_step(
        h.spec, h.cfg, class_weights=h.class_weights, reduction=h.reduction,
        stem_fn=h.stem_fn)

    rng = jax.random.PRNGKey(args.seed + 1)
    for epoch in range(start_epoch, start_epoch + args.num_epochs):
        if model_name == "mac":
            lr = mac_lr_for_epoch(args.l_rate, epoch)
            opt_state = set_learning_rate(opt_state, lr)
            print("learning rate %.5f" % lr)
        if not getattr(args, "val_only", False):
            profile_dir = getattr(args, "profile_dir", None) if epoch == start_epoch else None
            with maybe_profile(profile_dir):
                params, state, opt_state, summary, rng = h.run_epoch(
                    train_step, params, state, opt_state, train_loader, epoch,
                    train=True, rng=rng)
            print("Train Epoch: {}\tAverage loss: {:.6f}\tAccuracy: {}/{}\t"
                  "F1: w{:.4f}, micro{:.4f}\t({:.2f} ex/s)\n".format(
                      epoch, summary["loss"], summary["hit"], summary["num_examples"],
                      summary["f1_w"], summary["f1_micro"], summary["examples_per_sec"]))
            if args.checkpoint_path:
                # every process calls (the snapshot all-gathers any leaves
                # model-sharded across hosts — a collective); process 0 writes
                ckpt.save_checkpoint_async(
                    ckpt.epoch_path(args.checkpoint_path, epoch),
                    params=params, state=state, opt_state=opt_state,
                    meta={"epoch": epoch, "model": model_name,
                          "train_f1w": summary["f1_w"], "train_f1micro": summary["f1_micro"]})
        _, _, _, val_summary, rng = h.run_epoch(
            eval_step, params, state, opt_state, val_loader, epoch, train=False, rng=rng)
        h.print_val_summary(val_summary)
    ckpt.wait_for_pending_saves()
    return params, state


def run_test(args, model_name, *, q_only=False, v_only=False):
    """Test-split inference + t_/p_/q_ dumps (eval/q_and_v_test.py:64-142,269-271)."""
    h = Harness(args, model_name, q_only=q_only, v_only=v_only)
    test_ds = h.dataset("test", q_metadata=True, deterministic=True)
    print("%d test examples" % len(test_ds))
    if getattr(args, "feature_cache", False) and h.needs_stem and not q_only:
        if getattr(args, "int8_stem", False):
            raise SystemExit("--feature_cache and --int8_stem are mutually "
                             "exclusive (the cache is extracted with the bf16 stem)")
        from videonavqa_tpu.data.vnr import VNRBatchLoader, ensure_built

        ensure_built()
        files = _extract_features_once(args, h, ("test",))
        h.stem_fn, h.needs_stem = None, False
        loader = VNRBatchLoader(
            files["test"], args.batch_size, shuffle=False, mode="test",
            deterministic=not getattr(args, "stochastic_eval", False),
            seed=args.seed, row_slice=h.row_slice)
    elif getattr(args, "use_vnr", False) and not q_only:
        from videonavqa_tpu.data.vnr import VNRBatchLoader, ensure_built, pack_dataset

        ensure_built()
        path = os.path.join(args.data_dir, "test.vnr")
        if not os.path.exists(path) and jax.process_index() == 0:
            print(f"=> Packing test split into {path}")
            with _artifact_guard([path]):
                pack_dataset(args.data_dir, path, h.split["test"])
        _await_artifacts([path])
        loader = VNRBatchLoader(
            path, args.batch_size, shuffle=False, mode="test",
            deterministic=not getattr(args, "stochastic_eval", False),
            seed=args.seed, row_slice=h.row_slice)
    else:
        loader = BatchLoader(test_ds, args.batch_size, shuffle=False, mode="test",
                             num_workers=args.num_workers, seed=args.seed)

    params, state = h.init_model()
    if not args.checkpoint_path or not os.path.exists(args.checkpoint_path):
        raise SystemExit("=> Checkpoint required for testing (--checkpoint_path)")
    params, state_r, _, meta = ckpt.load_any_checkpoint(
        args.checkpoint_path, model_name=h.model_name, cfg=h.cfg,
        params_template=params, state_template=state)
    state = state_r if state_r is not None else state
    if "val_acc" in meta:
        print("=> Restored checkpoint with val acc %s" % meta["val_acc"])
    params, state, _ = h.shard_model(params, state)

    if h.needs_stem and h.stem_fn is None:  # int8: calibrate on one batch
        first = next(iter(loader.epoch(0)))
        calib = jnp.asarray(first["video"]).astype(jnp.float32) / 255.0
        h.stem_fn = load_stem(args, h.paths, calibration_video=calib, mesh=h.mesh)

    eval_step = make_eval_step(h.spec, h.cfg, class_weights=h.class_weights,
                               reduction=h.reduction, stem_fn=h.stem_fn)
    rng = jax.random.PRNGKey(args.seed + 2)
    multihost = h.mesh is not None and jax.process_count() > 1
    y_pred, y_target, qs = [], [], []
    total_loss, hit, num_examples = 0.0, 0, 0
    for np_batch in loader.epoch(0):
        if multihost and np.shape(np_batch["label"])[0] == args.batch_size:
            np_batch = host_localize_batch(np_batch, args.batch_size)
        labels_np = np_batch["label"]
        q_id = np_batch.get("q_id")
        batch, num_valid = prepare_batch(np_batch, mesh=h.mesh)
        rng, sub = jax.random.split(rng)
        metrics = eval_step(params, state, batch, sub)
        preds = _np_local_rows(metrics["preds"])[:num_valid]
        total_loss += float(metrics["loss"])
        hit += int(np.sum(preds == labels_np[:num_valid]))
        # real rows only, as the reference does (q_and_v_test.py:77 counts
        # before padding); our loss numerator also excludes padding (valid mask)
        num_examples += num_valid
        y_pred.append(preds)
        y_target.append(labels_np[:num_valid])
        if q_id is not None:
            qs.append(q_id[:num_valid])

    y_pred = np.concatenate(y_pred) if y_pred else np.array([], np.int64)
    y_target = np.concatenate(y_target) if y_target else np.array([], np.int64)
    qs = np.concatenate(qs) if qs else np.array([])
    if multihost:  # gather every host's rows for global metrics and dumps
        if len(qs):
            y_pred, y_target, qs = _gather_across_hosts(y_pred, y_target, qs)
        else:
            y_pred, y_target = _gather_across_hosts(y_pred, y_target)
        hit, num_examples = int(np.sum(y_pred == y_target)), int(len(y_pred))
    summary = {"loss": total_loss / max(num_examples, 1), "hit": hit,
               "num_examples": num_examples,
               "f1_w": M.f1_score(y_target, y_pred, average="weighted"),
               "f1_micro": M.f1_score(y_target, y_pred, average="micro"),
               "y_pred": y_pred, "y_target": y_target}
    h.print_val_summary(summary, header="Testing")

    if jax.process_index() == 0:
        base = os.path.basename(args.checkpoint_path)
        out_dir = os.path.dirname(args.checkpoint_path) or "."
        np.save(os.path.join(out_dir, "t_" + base), y_target)
        np.save(os.path.join(out_dir, "p_" + base), y_pred)
        np.save(os.path.join(out_dir, "q_" + base), qs)
    return summary
