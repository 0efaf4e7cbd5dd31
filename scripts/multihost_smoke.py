#!/usr/bin/env python
"""Multi-host data-parallel smoke: one real dual-view train step per process
group, global batch assembled from per-process shards.

Template for production multi-host launches and the harness behind
tests/test_multihost.py (2-process CPU mesh — the TPU answer to "test
multi-node without a cluster", SURVEY §4c). Each process:

  1. jax.distributed.initialize (coordinator from argv/env)
  2. global mesh over ALL processes' devices
  3. reads only its shard of the deterministic synthetic batch
  4. jax.make_array_from_process_local_data -> global arrays
  5. runs the jitted train step; prints the (identical) global loss

Single-process mode (--nproc 1) produces the reference loss for the same
global batch: multi-host DP must match it (batch-order invariant losses).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_full_loop(mesh, args) -> int:
    """Full train() epoch driver under multihost: sharded BatchIterator,
    global arrays, gathered eval. Every process must print identical
    metrics."""
    import dataclasses

    import numpy as np
    import jax

    from sdumc_tpu.core.config import (
        DataConfig, ExperimentConfig, ModelConfig, TrainConfig)
    from sdumc_tpu.data.feature_store import SyntheticSource
    from sdumc_tpu.data.pipeline import MoseiDataset
    from sdumc_tpu.models import get_model
    from sdumc_tpu.parallel import replicated_sharding
    from sdumc_tpu.train.loop import train

    dims = (16, 32, 16, 32)
    sources = {
        "audio": SyntheticSource("a", dims[0], 6, 24),
        "text": SyntheticSource("t", dims[1], 4, 12),
        "video": SyntheticSource("v", dims[2], 4, 16),
        "feat4": SyntheticSource("f", dims[3], 4, 12),
    }

    def make_ds(split, size):
        rng = np.random.default_rng(7)
        names = [f"{split}_{i}" for i in range(size)]
        labels = [{"emo": 0.0, "val": float(rng.uniform(-3, 3))} for _ in names]
        return MoseiDataset(names, labels, sources)

    cfg = ExperimentConfig(
        data=dataclasses.replace(
            DataConfig(), batch_size=8, length_buckets=(16, 32)),
        model=ModelConfig(input_dims=dims[:3], general_dim=32,
                          layers=(32, 16), fused_layers=(32, 32)),
        train=dataclasses.replace(
            TrainConfig(), epochs=1, checkpoint_dir="/tmp/multihost_smoke_ckpt"),
    )
    model = get_model(cfg.model)
    import jax.numpy as jnp

    params = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((2, 4, dims[0])), jnp.zeros((2, 4, dims[1])),
        jnp.zeros((2, 4, dims[2])),
    )["params"]
    params = jax.device_put(params, replicated_sharding(mesh))

    result = train(
        cfg, model, params,
        make_ds("train", 32), make_ds("val", 9), make_ds("test", 9),
        mesh=mesh, shard=(args.pid, args.nproc), multihost=args.nproc > 1,
        log=lambda *a: None,
    )
    h = result["history"][-1]
    print(
        f"MULTIHOST_LOOP pid={args.pid} nproc={args.nproc} "
        f"train_mse={h['train_mse_full']:.6f} "
        f"test_mae={h['test']['full']['mae']:.6f} "
        f"eval_mse={h['eval_mse_full']:.6f}"
    )
    return 0


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--nproc", type=int, default=1)
    p.add_argument("--pid", type=int, default=0)
    p.add_argument("--coordinator", type=str, default="127.0.0.1:9911")
    p.add_argument("--local_devices", type=int, default=4)
    p.add_argument("--steps", type=int, default=2)
    p.add_argument("--mode", type=str, default="step", choices=["step", "loop"],
                   help="step: one bare train step; loop: full train() epoch "
                        "driver with sharded BatchIterator + eval gather")
    p.add_argument("--mesh_shape", type=str, default="flat",
                   choices=["flat", "hier"],
                   help="flat: 1-D data mesh; hier: 2 x (n/2) DCN x ICI "
                        "hierarchical mesh (parallel.make_hierarchical_mesh) "
                        "— batches shard over BOTH axes, exercising the "
                        "hierarchical all-reduce across real processes")
    args = p.parse_args(argv)

    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={args.local_devices}"
        ).strip()
    os.environ.setdefault("JAX_PLATFORMS", "cpu")

    import jax

    jax.config.update("jax_platforms", "cpu")

    if args.nproc > 1:
        from sdumc_tpu.parallel.multihost import initialize_from_env

        pi, pc = initialize_from_env(args.coordinator, args.nproc, args.pid)
        assert (pi, pc) == (args.pid, args.nproc), (pi, pc)

    import numpy as np
    import jax.numpy as jnp

    from sdumc_tpu.core.config import LossConfig, ModelConfig
    from sdumc_tpu.models import get_model
    from sdumc_tpu.parallel import make_mesh, replicated_sharding
    from sdumc_tpu.parallel.multihost import host_local_batch_to_global
    from sdumc_tpu.train.state import create_train_state
    from sdumc_tpu.train.step import make_train_step

    n_global = args.nproc * args.local_devices
    devices = jax.devices()
    assert len(devices) == n_global, (len(devices), n_global)
    if args.mesh_shape == "hier":
        from sdumc_tpu.parallel import make_hierarchical_mesh

        assert n_global % 2 == 0, n_global
        mesh = make_hierarchical_mesh(2, n_global // 2, devices=devices)
    else:
        mesh = make_mesh(data_parallel=n_global, model_parallel=1,
                         devices=devices)

    if args.mode == "loop":
        return run_full_loop(mesh, args)

    dims = (16, 32, 16)
    cfg = ModelConfig(input_dims=dims)
    model = get_model(cfg)
    B, T = 2 * n_global, 8
    rng = np.random.default_rng(0)
    batch_np = {
        "audio": rng.normal(size=(B, T, dims[0])).astype(np.float32),
        "text": rng.normal(size=(B, T, dims[1])).astype(np.float32),
        "video": rng.normal(size=(B, T, dims[2])).astype(np.float32),
        "feat4": rng.normal(size=(B, T, dims[1])).astype(np.float32),
        "vals": rng.uniform(-3, 3, size=(B,)).astype(np.float32),
    }

    params = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.array(batch_np["audio"][:2]), jnp.array(batch_np["text"][:2]),
        jnp.array(batch_np["video"][:2]),
    )["params"]
    params = jax.device_put(params, replicated_sharding(mesh))
    state = create_train_state(model, params, lambda s: 1e-3, l2=1e-5)
    step = make_train_step(model, LossConfig())

    # contiguous block ownership: process p owns rows [p*B/nproc, (p+1)*B/nproc)
    rows = B // args.nproc
    lo = args.pid * rows
    local = {k: v[lo: lo + rows] for k, v in batch_np.items()}
    batch = host_local_batch_to_global(mesh, local)
    batch["t_max"] = tuple(jnp.int32(T) for _ in range(4))

    loss = None
    for _ in range(args.steps):
        state, metrics = step(state, batch, jax.random.PRNGKey(1))
        loss = float(jax.device_get(metrics["loss"]))
    print(f"MULTIHOST_LOSS pid={args.pid} nproc={args.nproc} loss={loss:.6f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
