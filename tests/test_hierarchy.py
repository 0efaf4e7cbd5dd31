"""Hierarchical DCN x ICI meshes and the combined TP x DP dual step
(VERDICT r1 item 5) on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # multi-axis train-step compiles; also run by
#                                the driver's dryrun_multichip every round

from sdumc_tpu.core.config import LossConfig, ModelConfig
from sdumc_tpu.models import get_model
from sdumc_tpu.parallel import (batch_sharding, make_hierarchical_mesh,
                                make_mesh, make_tp_dp_dual_step,
                                replicated_sharding, llama_specs,
                                shard_params)
from sdumc_tpu.train.state import create_train_state
from sdumc_tpu.train.step import make_train_step

DIMS = (16, 32, 16)


def _fusion_setup(text_dim=None):
    dims = DIMS if text_dim is None else (DIMS[0], text_dim, DIMS[2])
    cfg = ModelConfig(input_dims=dims, general_dim=32, layers=(32, 16),
                      fused_layers=(32, 32))
    model = get_model(cfg)
    B, T = 8, 8
    rng = np.random.default_rng(0)
    batch = {
        "audio": rng.normal(size=(B, T, dims[0])).astype(np.float32),
        "text": rng.normal(size=(B, T, dims[1])).astype(np.float32),
        "video": rng.normal(size=(B, T, dims[2])).astype(np.float32),
        "feat4": rng.normal(size=(B, T, dims[1])).astype(np.float32),
        "vals": rng.uniform(-3, 3, size=(B,)).astype(np.float32),
    }
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.asarray(batch["audio"]),
        jnp.asarray(batch["text"]), jnp.asarray(batch["video"]))["params"]
    return model, params, batch, (T, T, T, T)


def _fresh(params, mesh):
    """Fresh replicated copies: the train step donates its state, and
    device_put with an equivalent sharding may alias (not copy) the source
    buffers — donation would delete them out from under the next run."""
    return jax.device_put(jax.tree_util.tree_map(np.asarray, params),
                          replicated_sharding(mesh))


def _place(batch, mesh, data_axis):
    out = {
        k: jax.device_put(jnp.asarray(v),
                          batch_sharding(mesh, np.ndim(v), data_axis=data_axis))
        for k, v in batch.items()
    }
    return out


def test_hierarchical_mesh_train_step_matches_flat_dp():
    """2x4 (dcn, data) sharded train step == flat 8-way DP == single-device:
    the hierarchical all-reduce must not change the math."""
    model, params, batch, t_max = _fusion_setup()

    def run(mesh, data_axis):
        p = _fresh(params, mesh)
        state = create_train_state(model, p, lambda s: 1e-2, l2=0.0)
        d = _place(batch, mesh, data_axis)
        d["t_max"] = tuple(jnp.int32(t) for t in t_max)
        step = make_train_step(model, LossConfig())
        state, metrics = step(state, d, jax.random.PRNGKey(1))
        leaf = jax.tree_util.tree_leaves(state.params)[0]
        return float(metrics["loss"]), np.asarray(leaf)

    hier = make_hierarchical_mesh(2, 4)
    assert hier.axis_names == ("dcn", "data") and hier.devices.shape == (2, 4)
    loss_h, leaf_h = run(hier, ("dcn", "data"))
    loss_f, leaf_f = run(make_mesh(data_parallel=8), "data")
    assert np.isfinite(loss_h)
    np.testing.assert_allclose(loss_h, loss_f, rtol=1e-5)
    np.testing.assert_allclose(leaf_h, leaf_f, rtol=1e-4, atol=1e-6)


def test_tp_dp_combined_dual_step():
    """Frozen TP=2 LLaMA trunk + DP=4 fusion train step in ONE jit: the
    TP-sharded run must match the fully-replicated run, and the fusion
    params must actually move."""
    from sdumc_tpu.models.llama import LlamaConfig, LlamaModel

    lcfg = LlamaConfig.tiny()
    lmodel = LlamaModel(lcfg)
    model, params, batch, t_max = _fusion_setup(text_dim=lcfg.hidden_size)
    batch = dict(batch)
    batch.pop("text")
    rng = np.random.default_rng(1)
    batch["feat4"] = rng.normal(
        size=(8, 8, lcfg.hidden_size)).astype(np.float32)
    batch["text_ids"] = rng.integers(
        0, lcfg.vocab_size, size=(8, 8)).astype(np.int32)

    lparams = lmodel.init(jax.random.PRNGKey(3),
                          input_ids=jnp.asarray(batch["text_ids"]))["params"]

    def run(tp):
        mesh = make_mesh(data_parallel=8 // tp, model_parallel=tp)
        if tp > 1:
            lp = shard_params(lparams, mesh, llama_specs(lparams, mesh))
        else:
            lp = _fresh(lparams, mesh)
        p = _fresh(params, mesh)
        state = create_train_state(model, p, lambda s: 1e-2, l2=0.0)
        d = _place(batch, mesh, "data")
        d["t_max"] = tuple(jnp.int32(t) for t in t_max)
        step = make_tp_dp_dual_step(lmodel, model, LossConfig())
        state, metrics = step(state, lp, d, jax.random.PRNGKey(4))
        leaf = jax.tree_util.tree_leaves(state.params)[0]
        return float(metrics["loss"]), np.asarray(leaf)

    loss_tp, leaf_tp = run(tp=2)
    loss_rep, leaf_rep = run(tp=1)
    assert np.isfinite(loss_tp)
    np.testing.assert_allclose(loss_tp, loss_rep, rtol=1e-4)
    np.testing.assert_allclose(leaf_tp, leaf_rep, rtol=1e-3, atol=1e-5)
    # params moved: the step trained the fusion net
    ref = jax.tree_util.tree_leaves(params)[0]
    assert np.abs(leaf_tp - np.asarray(ref)).max() > 1e-6
