"""Checkpoint store: epoch-stamped single-file checkpoints on JAX pytrees.

Mirrors the reference's checkpoint *semantics* (eval/q_and_v_eval.py:69-70,
148-156, 336-346): each epoch writes ``e{epoch}_<checkpoint_path>`` containing
the model name, epoch, train metrics, parameters and optimizer state; restore
rebuilds (params, state, opt_state, epoch+1).

Format: a single .npz with '/'-joined pytree paths + a JSON metadata entry —
no pickle, portable, and layout-independent (restore maps arrays back onto a
template pytree from the model's init)."""

from __future__ import annotations

import io
import json
import os

import jax
import numpy as np


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def _np_global(leaf):
    """Host value of one leaf. A leaf sharded across hosts (multi-host
    model parallelism) is not fully addressable, so it is all-gathered to a
    replicated host copy first — a COLLECTIVE: every process must reach the
    checkpoint snapshot together (cli/common.py calls save on all processes;
    only process 0 writes)."""
    if isinstance(leaf, jax.Array) and not leaf.is_fully_addressable:
        from jax.experimental import multihost_utils as mhu

        # tiled=True: global arrays come back at their global shape
        return np.asarray(mhu.process_allgather(leaf, tiled=True))
    return np.asarray(leaf)


def flatten_tree(tree, prefix=""):
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {prefix + _path_str(path): _np_global(leaf) for path, leaf in leaves}


def unflatten_like(template, flat, prefix=""):
    """Map flat '{prefix}{path}' arrays back onto the template's structure."""
    paths, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path, leaf in paths:
        key = prefix + _path_str(path)
        if key not in flat:
            raise KeyError(f"checkpoint missing leaf {key!r}")
        arr = flat[key]
        if tuple(arr.shape) != tuple(np.shape(leaf)):
            raise ValueError(
                f"checkpoint leaf {key!r} has shape {arr.shape}, expected {np.shape(leaf)}")
        leaves.append(arr)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def _gather_flat(params, state, opt_state, meta):
    """Device->host snapshot of all leaves (safe against later donation)."""
    flat = flatten_tree(params, "params/")
    if state is not None:
        flat.update(flatten_tree(state, "state/"))
    if opt_state is not None:
        flat.update(flatten_tree(opt_state, "opt/"))
    flat["__meta__"] = np.frombuffer(
        json.dumps(meta or {}).encode("utf-8"), dtype=np.uint8)
    return flat


def _write_flat(path, flat):
    buf = io.BytesIO()
    np.savez(buf, **flat)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(buf.getvalue())
    os.replace(tmp, path)  # atomic even against mid-write failures


def save_checkpoint(path, *, params, state=None, opt_state=None, meta=None):
    """Write one global checkpoint. Under multi-host, EVERY process must call
    this (the snapshot all-gathers cross-host-sharded leaves); the file is
    written by process 0 only."""
    flat = _gather_flat(params, state, opt_state, meta)
    if jax.process_index() == 0:
        _write_flat(path, flat)


def load_checkpoint(path, *, params_template, state_template=None, opt_template=None):
    """Returns (params, state, opt_state, meta); state/opt are None when not
    requested or absent from the file."""
    with np.load(path, allow_pickle=False) as z:
        flat = {k: z[k] for k in z.files}
    meta = json.loads(bytes(flat.pop("__meta__").tobytes()).decode("utf-8"))
    params = unflatten_like(params_template, flat, "params/")
    state = (unflatten_like(state_template, flat, "state/")
             if state_template is not None and any(k.startswith("state/") for k in flat)
             else None)
    opt_state = (unflatten_like(opt_template, flat, "opt/")
                 if opt_template is not None and any(k.startswith("opt/") for k in flat)
                 else None)
    return params, state, opt_state, meta


def epoch_path(checkpoint_path: str, epoch: int) -> str:
    """'e{N}_' prefix on the basename (eval/q_and_v_eval.py:156)."""
    d, b = os.path.split(checkpoint_path)
    return os.path.join(d, f"e{epoch}_{b}")


def _is_torch_save(path: str) -> bool:
    """True for a PyTorch checkpoint: torch>=1.6 saves are zip archives
    containing a ``data.pkl`` member, legacy saves are bare pickles. Our own
    npz checkpoints are also zips, but always carry ``__meta__.npy`` — sniff
    contents, not extensions, so a reference ``.pt`` renamed to ``.npz`` (or
    vice versa) still routes correctly."""
    import zipfile

    if zipfile.is_zipfile(path):
        with zipfile.ZipFile(path) as z:
            names = z.namelist()
        if any(n.split("/")[-1] == "__meta__.npy" for n in names):
            return False
        return any(n.endswith("data.pkl") for n in names)
    with open(path, "rb") as f:
        magic = f.read(2)
    # legacy torch saves start with a pickle PROTO opcode (npz never does —
    # it is always a zip)
    return magic[:1] == b"\x80"


def load_any_checkpoint(path, *, model_name, cfg, params_template,
                        state_template=None, opt_template=None):
    """``load_checkpoint`` that also accepts the reference's torch
    checkpoints (eval/q_and_v_eval.py:148-156: ``{'epoch', 'state_dict',
    'optimizer', ...}``, or a bare state_dict), so a user switching from the
    reference can point --checkpoint_path at their existing ``.pt`` for
    eval/test/serving/resume without a conversion step. The import is the
    golden-tested ``zoo_import.import_model_checkpoint`` mapping; torch
    optimizer moments are NOT imported (``opt_state`` returns None — a
    resumed training run restarts Adam fresh at the checkpoint's epoch)."""
    if not _is_torch_save(path):
        return load_checkpoint(path, params_template=params_template,
                               state_template=state_template,
                               opt_template=opt_template)
    import torch

    from videonavqa_tpu.utils.zoo_import import (
        import_model_checkpoint, verify_shapes,
    )

    obj = torch.load(path, map_location="cpu", weights_only=False)
    sd = (obj["state_dict"]
          if isinstance(obj, dict) and "state_dict" in obj else obj)
    params, state, missing = import_model_checkpoint(model_name, sd, cfg)
    verify_shapes(model_name, params, state, cfg)
    if missing:
        print(f"=> Imported reference torch checkpoint {path}; "
              f"{len(missing)} leaves absent from reference state_dicts "
              f"re-initialized seeded (reference quirk): {missing}")
    meta = {}
    if isinstance(obj, dict) and "epoch" in obj:
        meta["epoch"] = int(obj["epoch"])
    return params, state, None, meta


# ---------------------------------------------------------------------------
# Async checkpointing: the device->host gather + npz write run on a single
# background worker so the training loop never blocks on IO (orbax-style;
# the reference's torch.save blocks the epoch loop, eval/q_and_v_eval.py:69-70).
# ---------------------------------------------------------------------------

_pending = []
_executor = None


def save_checkpoint_async(path, *, params, state=None, opt_state=None, meta=None):
    """Snapshot device arrays to host *now* (so later buffer donation can't
    race the save), then serialize + write on the background worker.

    Under multi-host, every process must call this at the same point (the
    snapshot's cross-host all-gather is a collective); only process 0 queues
    the actual file write. Returns the future on process 0, else None."""
    global _executor
    from concurrent.futures import ThreadPoolExecutor

    flat = _gather_flat(params, state, opt_state, meta)
    if jax.process_index() != 0:
        return None
    if _executor is None:
        _executor = ThreadPoolExecutor(max_workers=1, thread_name_prefix="ckpt")
    fut = _executor.submit(_write_flat, path, flat)
    _pending.append(fut)
    return fut


def wait_for_pending_saves():
    """Block until all queued async saves are durably on disk; re-raises the
    first failure."""
    global _pending
    pending, _pending = _pending, []
    for fut in pending:
        fut.result()
