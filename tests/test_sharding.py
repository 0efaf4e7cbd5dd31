"""Data-parallel training on the virtual 8-device CPU mesh.

The TPU answer to "test multi-node without a cluster": params replicated,
batch sharded over the `data` axis, XLA inserts the grad all-reduce. The DP
step must match the single-device step bit-for-bit (it is the same math).
"""

import pytest

import numpy as np

import jax
import jax.numpy as jnp

from sdumc_tpu.core.config import LossConfig, ModelConfig
from sdumc_tpu.models.fusion import SDUMCFusion
from sdumc_tpu.parallel import batch_sharding, make_mesh, replicated_sharding
from sdumc_tpu.train.state import create_train_state
from sdumc_tpu.train.step import make_eval_step, make_train_step

DIMS = (16, 32, 16)


def _setup(B=16, T=8):
    cfg = ModelConfig(input_dims=DIMS, general_dim=32, layers=(32, 16), fused_layers=(32, 32))
    model = SDUMCFusion(cfg)
    rng = np.random.default_rng(0)
    batch_np = {
        "audio": rng.normal(size=(B, T, DIMS[0])).astype(np.float32),
        "text": rng.normal(size=(B, T, DIMS[1])).astype(np.float32),
        "video": rng.normal(size=(B, T, DIMS[2])).astype(np.float32),
        "feat4": rng.normal(size=(B, T, DIMS[1])).astype(np.float32),
        "vals": rng.uniform(-3, 3, size=(B,)).astype(np.float32),
    }
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.array(batch_np["audio"]), jnp.array(batch_np["text"]), jnp.array(batch_np["video"]),
    )["params"]
    return model, params, batch_np, T


def _to_batch(batch_np, T, mesh=None):
    d = {k: jnp.array(v) for k, v in batch_np.items()}
    if mesh is not None:
        d = {
            k: jax.device_put(v, batch_sharding(mesh, v.ndim))
            for k, v in d.items()
        }
    d["t_max"] = tuple(jnp.int32(T) for _ in range(4))
    return d


@pytest.mark.fast
def test_mesh_construction():
    mesh = make_mesh()
    assert mesh.shape["data"] == 8 and mesh.shape["model"] == 1
    mesh2 = make_mesh(data_parallel=4, model_parallel=2)
    assert mesh2.shape == {"data": 4, "model": 2}


@pytest.mark.slow  # >20 s on this 1-core host; full suite still runs it
def test_dp_train_step_matches_single_device():
    model, params, batch_np, T = _setup()
    step = make_train_step(model, LossConfig())

    # NOTE: the train step donates its state, and device_put may alias
    # buffers — give each replica an explicit deep copy of the params.
    mesh = make_mesh()
    params_r = jax.device_put(
        jax.tree_util.tree_map(np.asarray, params), replicated_sharding(mesh)
    )

    state1 = create_train_state(model, params, lambda s: 1e-3, l2=1e-5)
    state1, m1 = step(state1, _to_batch(batch_np, T), jax.random.PRNGKey(1))

    state8 = create_train_state(model, params_r, lambda s: 1e-3, l2=1e-5)
    state8, m8 = step(state8, _to_batch(batch_np, T, mesh), jax.random.PRNGKey(1))

    assert np.isclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-5)
    l1 = jax.tree_util.tree_leaves(state1.params)
    l8 = jax.tree_util.tree_leaves(state8.params)
    for a, b in zip(l1, l8):
        # cross-shard grad-reduction order differs from the single-device
        # sum; Adam's rsqrt amplifies that to ~1e-6 on isolated elements.
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


@pytest.mark.fast  # pre-commit smoke tier: 8-device CPU mesh eval step
def test_dp_eval_step_sharded_output():
    model, params, batch_np, T = _setup()
    mesh = make_mesh()
    params_r = jax.device_put(params, replicated_sharding(mesh))
    ev = make_eval_step(model)
    v0, v1 = ev(params_r, _to_batch(batch_np, T, mesh))
    v0s, v1s = ev(params, _to_batch(batch_np, T))
    np.testing.assert_allclose(np.asarray(v0), np.asarray(v0s), rtol=1e-5, atol=1e-6)
