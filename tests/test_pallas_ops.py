"""Fused Pallas kernels vs the einsum formulations (interpret mode on CPU;
the same kernels compile on TPU where bench.py exercises them)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sdumc_tpu.ops.attention_pool import attention_pool
from sdumc_tpu.ops.masking import mask_time_scores
from sdumc_tpu.ops.pallas import fused_attention_pool, fused_cross_attention

B, T, D, Q = 4, 128, 256, 7


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    return {
        "x": jnp.asarray(rng.normal(size=(B, T, D)), jnp.float32),
        "W": jnp.asarray(rng.normal(size=(D, D)) * 0.06, jnp.float32),
        "b": jnp.asarray(rng.normal(size=(D,)) * 0.06, jnp.float32),
        "c": jnp.asarray(rng.normal(size=(D,)) * 0.08, jnp.float32),
        "q": jnp.asarray(rng.normal(size=(B, Q, D)) * 0.2, jnp.float32),
    }


@pytest.mark.parametrize("tmax", [None, 97])
def test_fused_pool_matches_einsum(data, tmax):
    tm = None if tmax is None else jnp.int32(tmax)
    ref, _ = attention_pool(data["x"], data["W"], data["b"], data["c"],
                            softmax_scale=0.3, t_max=tm)
    got = fused_attention_pool(data["x"], data["W"], data["b"], data["c"], tm,
                               softmax_scale=0.3, block_t=64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("tmax", [None, 97])
def test_fused_cross_matches_einsum(data, tmax):
    tm = None if tmax is None else jnp.int32(tmax)
    k = jnp.tanh(data["x"] @ data["W"] + data["b"])
    scores = mask_time_scores(0.3 * jnp.einsum("btd,bqd->btq", k, data["q"]), tm, axis=1)
    attn = jax.nn.softmax(scores, axis=1)
    ref = jnp.einsum("btd,btq->bqd", data["x"], attn)
    got = fused_cross_attention(data["q"], data["x"], data["W"], data["b"], tm,
                                softmax_scale=0.3, block_t=64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-6)


def test_fused_pool_grads_match(data):
    tm = jnp.int32(97)

    def f_fused(x, W, b, c):
        return jnp.sum(fused_attention_pool(x, W, b, c, tm, block_t=64) ** 2)

    def f_ref(x, W, b, c):
        return jnp.sum(attention_pool(x, W, b, c, t_max=tm)[0] ** 2)

    g1 = jax.grad(f_fused, argnums=(0, 1, 2, 3))(data["x"], data["W"], data["b"], data["c"])
    g2 = jax.grad(f_ref, argnums=(0, 1, 2, 3))(data["x"], data["W"], data["b"], data["c"])
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-5)


def test_model_pallas_mode_matches_einsum_mode(data):
    """Whole fusion model: use_pallas='on' (interpret) == 'off' numerics."""
    from sdumc_tpu.core.config import ModelConfig
    from sdumc_tpu.models.fusion import SDUMCFusion

    dims = (32, 64, 32)
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.normal(size=(2, 64, dims[0])), jnp.float32)
    t = jnp.asarray(rng.normal(size=(2, 64, dims[1])), jnp.float32)
    v = jnp.asarray(rng.normal(size=(2, 64, dims[2])), jnp.float32)
    tm = (jnp.int32(50), jnp.int32(30), jnp.int32(64))

    m_off = SDUMCFusion(ModelConfig(input_dims=dims, use_pallas="off"))
    params = m_off.init(jax.random.PRNGKey(0), a, t, v)["params"]
    out_off, _ = m_off.apply({"params": params}, a, t, v, t_max=tm)

    m_on = SDUMCFusion(ModelConfig(input_dims=dims, use_pallas="on"))
    out_on, _ = m_on.apply({"params": params}, a, t, v, t_max=tm)
    np.testing.assert_allclose(np.asarray(out_on), np.asarray(out_off), rtol=1e-4, atol=1e-5)
