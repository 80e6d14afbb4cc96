"""Multi-host initialization helpers.

On multi-host TPU pods, call ``initialize()`` once per process before any
device use; it wires jax.distributed from the standard TPU environment (or
explicit coordinator args) so the global mesh spans all hosts. Data feeding
stays host-local: each host's loader serves its own shard of the batch
(`host_batch_slice`), and GSPMD collectives ride ICI.
"""

from __future__ import annotations

import jax


def initialize(coordinator_address=None, num_processes=None, process_id=None,
               expect_multiprocess=False):
    """jax.distributed.initialize with TPU auto-detection when args are None.
    Safe to call on single-process setups (no-ops on failure).

    ``expect_multiprocess`` guards the worst misconfiguration in the
    auto-detect path: a swallowed initialize failure silently leaves every
    host training alone as N independent single-process runs, each producing
    plausible-looking metrics. When set (the CLI sets it for --distributed),
    ending up with ``jax.process_count() == 1`` raises instead — unless the
    caller explicitly asked for one process."""
    if not jax.distributed.is_initialized():
        try:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id)
        except (ValueError, RuntimeError) as e:  # single-process / already init
            if "already initialized" not in str(e) \
                    and num_processes not in (None, 1):
                raise
    if expect_multiprocess and num_processes != 1 and jax.process_count() == 1:
        raise RuntimeError(
            "--distributed was requested but jax.distributed resolved to a "
            "single process: this host would silently train alone while its "
            "pod peers do the same. Pass explicit --coordinator_address/"
            "--num_processes/--process_id (or --num_processes 1 / drop "
            "--distributed if single-process is intended).")


def host_batch_slice(global_batch_size: int):
    """(start, size) of this host's slice of the global batch."""
    n = jax.process_count()
    i = jax.process_index()
    assert global_batch_size % n == 0, \
        f"global batch {global_batch_size} not divisible by {n} hosts"
    per = global_batch_size // n
    return i * per, per


def global_batch_from_host_shards(mesh, host_batch):
    """Assemble a globally-sharded batch from each host's local shard using
    jax.make_array_from_process_local_data (DP over 'data')."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    out = {}
    for k, v in host_batch.items():
        sharding = NamedSharding(mesh, P("data", *([None] * (v.ndim - 1))))
        out[k] = jax.make_array_from_process_local_data(sharding, v)
    return out
