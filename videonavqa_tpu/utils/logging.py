"""Structured observability: JSONL metrics + on-demand device profiling.

The reference's observability is print-to-stdout redirected to .log files
(eval.sh:60-61). Here every metric line additionally lands in a JSONL stream
(one object per event) so runs are machine-parseable, and a profiler context
wraps training steps with jax.profiler traces on request."""

from __future__ import annotations

import contextlib
import json
import os
import time


class MetricsLogger:
    """Append-only JSONL event log; no-op when path is None."""

    def __init__(self, path=None, run_meta=None):
        self.path = path
        self._f = None
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            self._f = open(path, "a", buffering=1)
            if run_meta:
                self.log("run_start", **run_meta)

    def log(self, event, **fields):
        if self._f is None:
            return
        rec = {"event": event, "time": time.time()}
        rec.update(fields)
        self._f.write(json.dumps(rec, default=_jsonify) + "\n")

    def close(self):
        if self._f:
            self._f.close()
            self._f = None


def _jsonify(x):
    try:
        import numpy as np

        if isinstance(x, (np.integer, np.floating)):
            return x.item()
        if isinstance(x, np.ndarray):
            return x.tolist()
    except Exception:
        pass
    return str(x)


@contextlib.contextmanager
def maybe_profile(trace_dir=None):
    """jax.profiler trace context when trace_dir is given, else a no-op."""
    if not trace_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """block_until_ready-fenced step timing with a short warmup skip.

    Caveat: on the remote axon backend block_until_ready can return before
    queued execution drains — fetch a VALUE (float()/device_get) for a hard
    fence when measuring there (see bench.py)."""

    def __init__(self, skip=2):
        self.skip = skip
        self.count = 0
        self.total = 0.0
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, result=None):
        if result is not None:
            import jax

            jax.block_until_ready(result)
        dt = time.perf_counter() - self._t0
        self.count += 1
        if self.count > self.skip:
            self.total += dt
        return dt

    @property
    def mean_ms(self):
        steps = max(self.count - self.skip, 1)
        return 1000.0 * self.total / steps
