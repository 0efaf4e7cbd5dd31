"""Multi-host data parallelism (SURVEY §5 "distributed communication
backend"; §7 step 6).

The reference has nothing here (DDP commented out, --local_rank unused);
this is the rebuild's own bar. The TPU design:

* ``jax.distributed.initialize()`` once per process — after it,
  ``jax.devices()`` is the GLOBAL device list and one jit spans all hosts
  (collectives ride ICI intra-pod, DCN across pods).
* Each host reads only its shard of every batch
  (BatchIterator(shard_index=process_index, shard_count=process_count))
  and assembles the global sharded array with
  ``jax.make_array_from_process_local_data`` — no host ever materializes
  the global batch.
* The jitted train step is unchanged: grads/metrics are computed over the
  global batch, XLA inserts the cross-host all-reduce. Metric fetches via
  ``jax.device_get`` return the same value on every process.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def initialize_from_env(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    shutdown_timeout_seconds: Optional[int] = None,
) -> tuple:
    """Call jax.distributed.initialize from args or SDUMC_* env vars.

    Env contract (each process): SDUMC_COORDINATOR=host:port,
    SDUMC_NUM_PROCESSES, SDUMC_PROCESS_ID. On TPU pods with the standard
    metadata these are auto-discovered and plain initialize() suffices.
    Returns (process_index, process_count).

    ``shutdown_timeout_seconds`` (or SDUMC_SHUTDOWN_TIMEOUT) bounds how
    long the coordination service waits for stragglers at the shutdown
    barrier. jax's default is 300 s; on oversubscribed hosts (CI boxes
    running N processes on < N cores) the serialized post-loop host work
    can legitimately spread wider than that, so the harness raises it."""
    import jax

    coordinator = coordinator or os.environ.get("SDUMC_COORDINATOR")
    num_processes = num_processes or _int_env("SDUMC_NUM_PROCESSES")
    process_id = process_id if process_id is not None else _int_env("SDUMC_PROCESS_ID")
    shutdown_timeout_seconds = (shutdown_timeout_seconds
                                or _int_env("SDUMC_SHUTDOWN_TIMEOUT") or 300)
    if coordinator:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
            shutdown_timeout_seconds=shutdown_timeout_seconds,
        )
    else:
        jax.distributed.initialize()  # TPU pod auto-discovery
    return jax.process_index(), jax.process_count()


def _int_env(name: str) -> Optional[int]:
    v = os.environ.get(name)
    return int(v) if v is not None else None


def host_local_batch_to_global(mesh, batch_dict: dict) -> dict:
    """Assemble per-host batch shards into global jit-ready arrays.

    ``batch_dict`` holds THIS process's rows (global_batch/process_count of
    them). Array values get batch-sharded global layouts; scalars and the
    t_max tuple stay replicated python/weak-type values."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    # batch rows shard over every non-model mesh axis: a flat DP mesh
    # contributes just "data"; a hierarchical DCN x ICI mesh ("dcn", "data")
    # shards over both so XLA emits the hierarchical all-reduce
    # (reduce-scatter on ICI, cross-pod exchange on DCN)
    daxes = tuple(a for a in mesh.axis_names if a != "model")
    batch_axes = daxes[0] if len(daxes) == 1 else daxes
    out = {}
    for k, v in batch_dict.items():
        if k == "t_max":
            out[k] = v
            continue
        arr = np.asarray(v)
        sharding = NamedSharding(mesh, P(batch_axes, *([None] * (arr.ndim - 1))))
        out[k] = jax.make_array_from_process_local_data(sharding, arr)
    return out


def process_metrics(metrics):
    """device_get a metrics tree computed under a global mesh; values are
    identical on every process (the all-reduce happened inside jit)."""
    import jax

    return jax.device_get(metrics)


def warmup_collectives(mesh=None) -> None:
    """Create the cross-process communicator cliques while processes are
    still in lockstep (fresh off ``initialize``'s barrier).

    XLA's CPU gloo backend initializes each clique lazily at its first
    collective, with a hard ~30 s rendezvous timeout. On hosts where
    per-process tracing work serializes (fewer cores than processes, CI
    boxes), a clique first touched mid-run can form while peers are >30 s
    apart and fail spuriously. Touching both cliques here — the
    per-process-leader clique (process_allgather) and the all-devices
    clique (a global psum) — pins them at a point where every process is
    synchronized, and later collectives reuse the cached contexts. On TPU
    this is a cheap no-op barrier."""
    import jax
    import numpy as np
    from jax.experimental import multihost_utils

    multihost_utils.process_allgather(np.int32(0), tiled=False)
    if mesh is not None and jax.process_count() > 1:
        from jax.sharding import NamedSharding, PartitionSpec

        n_local = mesh.devices.size // jax.process_count()
        arr = jax.make_array_from_process_local_data(
            NamedSharding(mesh, PartitionSpec(mesh.axis_names)),
            np.zeros(n_local, np.float32))
        float(jax.jit(lambda a: a.sum())(arr))
