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


def flatten_tree(tree, prefix=""):
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {prefix + _path_str(path): np.asarray(leaf) for path, leaf in leaves}


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
    _write_flat(path, _gather_flat(params, state, opt_state, meta))


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


# ---------------------------------------------------------------------------
# Async checkpointing: the device->host gather + npz write run on a single
# background worker so the training loop never blocks on IO (orbax-style;
# the reference's torch.save blocks the epoch loop, eval/q_and_v_eval.py:69-70).
# ---------------------------------------------------------------------------

_pending = []
_executor = None


def save_checkpoint_async(path, *, params, state=None, opt_state=None, meta=None):
    """Snapshot device arrays to host *now* (so later buffer donation can't
    race the save), then serialize + write on the background worker."""
    global _executor
    from concurrent.futures import ThreadPoolExecutor

    flat = _gather_flat(params, state, opt_state, meta)
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
