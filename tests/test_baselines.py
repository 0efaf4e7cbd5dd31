"""Baseline fusion families (tfn/lmf/attention/misa/mmim + the aligned
mfn/graph_mfn/mfm/mctn/mult): registry dispatch, dual-view train-step
integration, and learnability — the reference names these models but ships
no code (toolkit/models/__init__.py:7-27 dead imports)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sdumc_tpu.core.config import LossConfig, ModelConfig
from sdumc_tpu.models import get_model
from sdumc_tpu.train.state import create_train_state
from sdumc_tpu.train.step import make_eval_step, make_train_step

DIMS = (16, 32, 16)


def _batch(rng, B=12, T=6):
    return {
        "audio": jnp.asarray(rng.normal(size=(B, T, DIMS[0])), jnp.float32),
        "text": jnp.asarray(rng.normal(size=(B, T, DIMS[1])), jnp.float32),
        "video": jnp.asarray(rng.normal(size=(B, T, DIMS[2])), jnp.float32),
        "feat4": jnp.asarray(rng.normal(size=(B, T, DIMS[1])), jnp.float32),
        "vals": jnp.asarray(rng.uniform(-2, 2, B), jnp.float32),
        "t_max": tuple(jnp.int32(T) for _ in range(4)),
    }


@pytest.mark.parametrize(
    "name", ["tfn", "lmf", "attention",
             pytest.param("misa", marks=pytest.mark.slow),
             "mmim", "mfn", "graph_mfn", "mfm", "mctn",
             pytest.param("mult", marks=pytest.mark.slow)])
def test_baseline_trains_under_the_dual_view_loop(name):
    cfg = ModelConfig(name=name, input_dims=DIMS, baseline_hidden_dim=8,
                      baseline_rank=3, baseline_mem_dim=8,
                      baseline_align_t=6, baseline_layers=1,
                      baseline_heads=2)
    model = get_model(cfg)
    rng = np.random.default_rng(0)
    batch = _batch(rng)
    params = model.init(
        jax.random.PRNGKey(0), batch["audio"], batch["text"], batch["video"]
    )["params"]

    vals, aux = model.apply(
        {"params": params}, batch["audio"], batch["text"], batch["video"],
        t_max=batch["t_max"][:3], deterministic=True)
    assert vals.shape == (12, 1)
    for key in ("features", "rnc", "text_feat", "text_query_feat"):
        assert aux[key].ndim == 2

    state = create_train_state(model, params, lambda s: 5e-3, l2=1e-5)
    step = make_train_step(model, LossConfig())
    first = None
    for _ in range(15):
        state, metrics = step(state, dict(batch), jax.random.PRNGKey(1))
        if first is None:
            first = float(metrics["loss"])
    assert np.isfinite(first)
    assert float(metrics["loss"]) < first  # it learns

    v0, v1 = make_eval_step(model)(state.params, batch)
    assert v0.shape == v1.shape == (12,)
    assert not np.allclose(np.asarray(v0), np.asarray(v1))  # feat4 != text


def test_unknown_model_lists_registered():
    with pytest.raises(KeyError) as exc:
        get_model(ModelConfig(name="nope"))
    msg = str(exc.value)
    assert "tfn" in msg and "lmf" in msg
