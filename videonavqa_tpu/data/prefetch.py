"""Device-feed double buffering.

Overlaps host->HBM transfer of batch N+1 with the device computation of batch
N: the host thread ahead-of-time device_puts the next prepared batch while the
jitted step is in flight (JAX dispatch is async, so simply staying one batch
ahead keeps the copy engine busy). This is the TPU counterpart of the
reference's DataLoader worker prefetch (eval/q_and_v_eval.py:248-251)."""

from __future__ import annotations

import collections
import queue as queue_mod
import threading

import jax


def host_prefetch(batch_iter, *, depth: int = 2):
    """Decode-ahead: a background thread drains the (CPU-bound) loader into a
    bounded queue so host decode overlaps device compute even while the
    consumer thread is busy dispatching. The native VNR decode releases the
    GIL (ctypes), so this is real overlap on a single core."""
    q = queue_mod.Queue(maxsize=depth)
    END = object()

    def produce():
        try:
            for b in batch_iter:
                q.put(b)
            q.put(END)
        except BaseException as e:  # re-raised on the consumer side
            q.put(e)

    threading.Thread(target=produce, daemon=True).start()
    while True:
        item = q.get()
        if item is END:
            return
        if isinstance(item, BaseException):
            raise item
        yield item


def device_prefetch(batch_iter, prepare, *, depth: int = 2):
    """Yields prepared batches one transfer ahead.

    ``prepare`` maps a raw loader batch to its device form (e.g.
    cli.common.prepare_batch). ``depth`` bounds how many prepared batches are
    in flight.
    """
    queue = collections.deque()
    it = iter(batch_iter)
    try:
        while len(queue) < depth:
            queue.append(prepare(next(it)))
    except StopIteration:
        pass
    while queue:
        out = queue.popleft()
        try:
            queue.append(prepare(next(it)))
        except StopIteration:
            pass
        yield out
