"""Pipeline parallelism (parallel/pipeline.py): GPipe schedule over the
stacked LLaMA trunk == sequential single-device forward. Runs on the
conftest 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from sdumc_tpu.models.llama import LlamaConfig, LlamaModel
from sdumc_tpu.parallel.pipeline import llama_pp_forward, pipeline_apply


@pytest.fixture(scope="module")
def mesh4():
    return Mesh(np.array(jax.devices()[:4]), ("stage",))


def test_pipeline_apply_matches_sequential(mesh4):
    """Generic layer pipeline: y = x through L affine layers, any M."""
    rng = np.random.default_rng(0)
    L, B, D = 8, 8, 16
    W = jnp.asarray(rng.normal(size=(L, D, D)).astype(np.float32) * 0.3)
    b = jnp.asarray(rng.normal(size=(L, D)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))

    def layer_fn(lp, h, extras):
        return jnp.tanh(h @ lp["w"] + lp["b"])

    ref = x
    for i in range(L):
        ref = layer_fn({"w": W[i], "b": b[i]}, ref, ())

    for M in (1, 2, 4, 8):
        got = pipeline_apply(mesh4, layer_fn, {"w": W, "b": b}, x,
                             n_microbatches=M)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


def test_llama_pp_forward_matches_single_device(mesh4):
    cfg = LlamaConfig.tiny(num_layers=8, scan_layers=True)
    model = LlamaModel(cfg)
    rng = np.random.default_rng(1)
    B, T = 8, 12
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, T)))
    params = model.init(jax.random.PRNGKey(0), input_ids=ids)["params"]

    ref = model.apply({"params": params}, input_ids=ids,
                      output_hidden_states=True)
    last, taps = llama_pp_forward(model, params, mesh4, input_ids=ids,
                                  n_microbatches=4, collect_taps=2)
    np.testing.assert_allclose(np.asarray(last),
                               np.asarray(ref["last_hidden_state"]),
                               rtol=2e-4, atol=2e-4)
    # taps[k] = pre-norm output of layer L-K+k == hidden_states[L-K+k+1]
    # for all but the final entry (HF keeps the final one post-norm)
    hs = ref["hidden_states"]
    np.testing.assert_allclose(np.asarray(taps[0]), np.asarray(hs[7]),
                               rtol=2e-4, atol=2e-4)
    # last tap is the PRE-norm final layer output; hs[-1] is post-norm —
    # they must differ (contract documented in llama_pp_forward)
    assert not np.allclose(np.asarray(taps[1]), np.asarray(hs[8]))


def test_llama_pp_bad_configs_raise(mesh4):
    cfg = LlamaConfig.tiny(num_layers=6, scan_layers=True)  # 6 % 4 != 0
    model = LlamaModel(cfg)
    ids = jnp.zeros((4, 4), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), input_ids=ids)["params"]
    with pytest.raises(AssertionError):
        llama_pp_forward(model, params, mesh4, input_ids=ids,
                         n_microbatches=2)
