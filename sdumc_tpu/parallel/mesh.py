"""Device mesh and sharding layout.

The reference never ships working parallelism (DDP/DataParallel commented
out at main_frame_val_text_missing.py:307-309, DistributedSampler commented
at cmumosei.py:101, --local_rank unused) — its only real multi-device use is
`accelerate.dispatch_model` for the 7B extractor graphs. The TPU design is:

* fusion-net training: a 1-D ``data`` mesh axis; params replicated, batch
  sharded on axis 0; XLA inserts the grad all-reduce over ICI (standard
  jit-DP). A 12.8M-param model needs nothing fancier.
* extractor graphs (Vicuna-7B etc.): a 2-D ``(data, model)`` mesh with
  tensor-parallel weight shardings (see extract/).

Multi-host: the same code runs under `jax.distributed.initialize()`; batches
shard per-host via BatchIterator's shard_index/shard_count, and the `data`
axis spans all hosts' devices (collectives ride ICI intra-pod, DCN across).
"""

from __future__ import annotations


import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data_parallel: int = -1,
    model_parallel: int = 1,
    *,
    devices=None,
    data_axis: str = "data",
    model_axis: str = "model",
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data_parallel == -1:
        assert n % model_parallel == 0, (n, model_parallel)
        data_parallel = n // model_parallel
    assert data_parallel * model_parallel <= n, (data_parallel, model_parallel, n)
    grid = np.array(devices[: data_parallel * model_parallel]).reshape(
        data_parallel, model_parallel
    )
    return Mesh(grid, (data_axis, model_axis))


def batch_sharding(mesh: Mesh, ndim: int = 3, data_axis="data") -> NamedSharding:
    """Shard axis 0 (batch) across the data axis (a name or a tuple of
    names for hierarchical DCN x ICI meshes), replicate the rest."""
    return NamedSharding(mesh, P(data_axis, *([None] * (ndim - 1))))


def make_hierarchical_mesh(dcn: int, ici: int, *, devices=None) -> Mesh:
    """A 2-D (dcn, data) mesh shaped like a multi-pod deployment: the outer
    ``dcn`` axis models the slow cross-pod network, the inner ``data`` axis
    the fast intra-pod ICI ring. Shard batches with
    ``batch_sharding(mesh, ndim, data_axis=("dcn", "data"))`` — XLA then
    emits a hierarchical all-reduce (reduce-scatter inside each pod,
    cross-pod exchange of the partial sums, all-gather back), which is the
    layout that keeps the heavy traffic on ICI. On one host this validates
    the program structure; on a real multi-pod slice the same mesh comes
    from jax.experimental.mesh_utils.create_hybrid_device_mesh."""
    devices = list(devices if devices is not None else jax.devices())
    assert dcn * ici <= len(devices), (dcn, ici, len(devices))
    grid = np.array(devices[: dcn * ici]).reshape(dcn, ici)
    return Mesh(grid, ("dcn", "data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree, data_axis: str = "data"):
    """device_put every array leaf with batch sharding on dim 0; scalars and
    python leaves are replicated."""

    def put(x):
        arr = np.asarray(x)
        if arr.ndim == 0:
            return jax.device_put(arr, replicated_sharding(mesh))
        return jax.device_put(arr, batch_sharding(mesh, arr.ndim, data_axis))

    return jax.tree_util.tree_map(put, tree)
