"""Checkpoint-exact parity: the Flax fusion net vs the reference torch model.

Strategy: instantiate the reference torch module (imported read-only from
/root/reference), convert its randomly-initialized state_dict through the
torch->jax converter, and require identical outputs — including under the
static-bucket + t_max padding emulation that replaces the reference's
dynamic batch-max padding.
"""

import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from sdumc_tpu.convert import torch_state_dict_to_params
from sdumc_tpu.core.config import ModelConfig
from sdumc_tpu.models.fusion import SDUMCFusion

INPUT_DIMS = (48, 96, 48)  # small stand-ins for (1024, 4096, 1024)


pytestmark = pytest.mark.fast  # pre-commit smoke tier (PARITY.md)

@pytest.fixture(scope="module")
def torch_model(ref_model_module):
    args = types.SimpleNamespace(input_dims=list(INPUT_DIMS))
    torch.manual_seed(0)
    model = ref_model_module.WengnetMOSEIMultViewsTextMissing(args)
    model.eval()
    return model


@pytest.fixture(scope="module")
def jax_setup(torch_model):
    cfg = ModelConfig(input_dims=INPUT_DIMS)
    model = SDUMCFusion(cfg)
    rng = jax.random.PRNGKey(0)
    dummy = (
        jnp.zeros((2, 4, INPUT_DIMS[0])),
        jnp.zeros((2, 4, INPUT_DIMS[1])),
        jnp.zeros((2, 4, INPUT_DIMS[2])),
    )
    template = model.init(rng, *dummy)["params"]
    params, report = torch_state_dict_to_params(torch_model.state_dict(), template)
    return model, params, report


def _rand_batch(rng, b, ta, tt, tv):
    return (
        rng.normal(size=(b, ta, INPUT_DIMS[0])).astype(np.float32),
        rng.normal(size=(b, tt, INPUT_DIMS[1])).astype(np.float32),
        rng.normal(size=(b, tv, INPUT_DIMS[2])).astype(np.float32),
    )


def _torch_forward(torch_model, a, t, v):
    with torch.no_grad():
        vals, embs = torch_model(
            [torch.tensor(a), torch.tensor(t), torch.tensor(v), False]
        )
    return vals.numpy(), [e.numpy() for e in embs]


def test_converter_covers_all_params(jax_setup):
    _, _, report = jax_setup
    assert report["missing"] == [], f"unfilled flax params: {report['missing']}"
    assert report["unmapped"] == [], f"unmapped torch keys: {report['unmapped']}"


def test_forward_parity_unpadded(torch_model, jax_setup):
    model, params, _ = jax_setup
    rng = np.random.default_rng(1)
    a, t, v = _rand_batch(rng, b=5, ta=17, tt=9, tv=13)
    ref_vals, ref_embs = _torch_forward(torch_model, a, t, v)
    vals, aux = model.apply(
        {"params": params}, jnp.array(a), jnp.array(t), jnp.array(v)
    )
    np.testing.assert_allclose(np.asarray(vals), ref_vals, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(aux["features"]), ref_embs[0], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(aux["rnc"]), ref_embs[1], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(aux["text_feat"]), ref_embs[2], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(aux["text_query_feat"]), ref_embs[3], rtol=1e-4, atol=1e-5)


def test_forward_parity_bucketed_padding(torch_model, jax_setup):
    """Zero-padding to a larger static bucket + traced t_max must reproduce
    the reference's batch-max padding numerics exactly."""
    model, params, _ = jax_setup
    rng = np.random.default_rng(2)
    b, ta, tt, tv = 4, 11, 7, 5
    a, t, v = _rand_batch(rng, b, ta, tt, tv)
    # emulate ragged batch: zero out the tails of some rows (these are the
    # reference's "pad rows participating in softmax")
    a[2, 8:], t[1, 4:], v[3, 2:] = 0.0, 0.0, 0.0
    ref_vals, ref_embs = _torch_forward(torch_model, a, t, v)

    # now pad everything to a bucket 32 and pass t_max = the batch max
    def bucket(x, T):
        out = np.zeros((x.shape[0], T, x.shape[2]), dtype=x.dtype)
        out[:, : x.shape[1]] = x
        return out

    vals, aux = model.apply(
        {"params": params},
        jnp.array(bucket(a, 32)),
        jnp.array(bucket(t, 32)),
        jnp.array(bucket(v, 32)),
        t_max=(jnp.int32(ta), jnp.int32(tt), jnp.int32(tv)),
    )
    np.testing.assert_allclose(np.asarray(vals), ref_vals, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(aux["features"]), ref_embs[0], rtol=1e-4, atol=1e-5)


def test_jit_bucketed_is_shape_stable(jax_setup):
    """One compiled graph serves any t_max within a bucket."""
    model, params, _ = jax_setup

    @jax.jit
    def fwd(a, t, v, tm):
        return model.apply({"params": params}, a, t, v, t_max=tm)[0]

    rng = np.random.default_rng(3)
    a, t, v = _rand_batch(rng, 3, 32, 32, 32)
    out1 = fwd(jnp.array(a), jnp.array(t), jnp.array(v),
               (jnp.int32(30), jnp.int32(12), jnp.int32(20)))
    out2 = fwd(jnp.array(a), jnp.array(t), jnp.array(v),
               (jnp.int32(5), jnp.int32(32), jnp.int32(9)))
    assert out1.shape == out2.shape == (3, 1)
    assert not np.allclose(np.asarray(out1), np.asarray(out2))
