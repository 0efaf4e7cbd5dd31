"""scan_layers LLaMA trunk == unrolled trunk (forward, cache decode, beam
generate, TP specs). The scan layout is what the 7B programs compile with:
one layer body instead of 32 (compile memory/time), stacked params."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdumc_tpu.convert.hf_llama import stack_scan_layers
from sdumc_tpu.models.llama import (LlamaConfig, LlamaForCausalLM, LlamaModel,
                                    cache_mask, init_cache)


@pytest.fixture(scope="module")
def setup():
    cfg_u = LlamaConfig.tiny()
    cfg_s = dataclasses.replace(cfg_u, scan_layers=True)
    mu = LlamaForCausalLM(cfg_u)
    ms = LlamaForCausalLM(cfg_s)
    ids = jnp.asarray(np.random.default_rng(0).integers(
        0, cfg_u.vocab_size, (2, 6)))
    pu = mu.init(jax.random.PRNGKey(0), input_ids=ids)["params"]
    ps = stack_scan_layers(pu)
    return cfg_u, cfg_s, mu, ms, pu, ps, ids


def test_forward_and_hidden_states_match(setup):
    cfg_u, cfg_s, mu, ms, pu, ps, ids = setup
    ou = mu.apply({"params": pu}, input_ids=ids, output_hidden_states=True)
    os_ = ms.apply({"params": ps}, input_ids=ids, output_hidden_states=True)
    np.testing.assert_allclose(np.asarray(ou["logits"]),
                               np.asarray(os_["logits"]), atol=1e-5)
    assert len(ou["hidden_states"]) == len(os_["hidden_states"])
    for a, b in zip(ou["hidden_states"], os_["hidden_states"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_cache_decode_matches(setup):
    cfg_u, cfg_s, mu, ms, pu, ps, ids = setup
    B, T = ids.shape
    pos = jnp.broadcast_to(jnp.arange(T)[None], (B, T))
    ou = mu.apply({"params": pu}, input_ids=ids, positions=pos,
                  attn_mask=cache_mask(pos, 10),
                  caches=init_cache(cfg_u, B, 10))
    os_ = ms.apply({"params": ps}, input_ids=ids, positions=pos,
                   attn_mask=cache_mask(pos, 10),
                   caches=init_cache(cfg_s, B, 10))
    np.testing.assert_allclose(np.asarray(ou["last_hidden_state"]),
                               np.asarray(os_["last_hidden_state"]), atol=1e-5)
    ku = np.stack([np.asarray(c["k"]) for c in ou["caches"]])
    np.testing.assert_allclose(ku, np.asarray(os_["caches"]["k"]), atol=1e-5)
    assert np.asarray(os_["caches"]["index"]).tolist() == [T] * cfg_u.num_layers

    # one decode step from the filled cache
    nxt = ids[:, -1:]
    pos1 = jnp.full((B, 1), T, jnp.int32)
    o2u = mu.apply({"params": pu}, input_ids=nxt, positions=pos1,
                   attn_mask=cache_mask(pos1, 10), caches=ou["caches"])
    o2s = ms.apply({"params": ps}, input_ids=nxt, positions=pos1,
                   attn_mask=cache_mask(pos1, 10), caches=os_["caches"])
    np.testing.assert_allclose(np.asarray(o2u["logits"]),
                               np.asarray(o2s["logits"]), atol=1e-5)


def test_beam_generate_matches(setup):
    from sdumc_tpu.models.generation import beam_generate

    cfg_u, cfg_s, mu, ms, pu, ps, ids = setup
    rng = np.random.default_rng(1)
    pe = jnp.asarray(rng.normal(size=(1, 5, cfg_u.hidden_size))
                     .astype(np.float32) * 0.2)

    def run(model, params, cfg):
        apply_fn = lambda **kw: model.apply({"params": params}, **kw)  # noqa: E731
        embed_fn = lambda t: params["model"]["embed_tokens"]["embedding"][t]  # noqa: E731
        return beam_generate(apply_fn, pe, cfg, embed_fn=embed_fn,
                             num_beams=3, max_new_tokens=6, eos_id=-1)

    ou = run(mu, pu, cfg_u)
    os_ = run(ms, ps, cfg_s)
    np.testing.assert_array_equal(np.asarray(ou["tokens"]),
                                  np.asarray(os_["tokens"]))
    np.testing.assert_allclose(np.asarray(ou["taps"]),
                               np.asarray(os_["taps"]), atol=1e-4)


def test_stacked_tp_specs_shard_trailing_dims(setup):
    from sdumc_tpu.parallel import llama_specs, make_mesh

    _, cfg_s, _, _, _, ps, _ = setup
    mesh = make_mesh(data_parallel=4, model_parallel=2)
    specs = llama_specs(ps, mesh)
    q = specs["model"]["layers"]["self_attn"]["q_proj"]["kernel"]
    assert q == jax.sharding.PartitionSpec(None, None, "model")
    o = specs["model"]["layers"]["self_attn"]["o_proj"]["kernel"]
    assert o == jax.sharding.PartitionSpec(None, "model", None)
    # layer axis never sharded
    for leaf_spec in jax.tree_util.tree_leaves(
            specs["model"]["layers"],
            is_leaf=lambda x: isinstance(x, jax.sharding.PartitionSpec)):
        assert len(leaf_spec) == 0 or leaf_spec[0] is None


def test_stacked_tp_forward_matches_replicated(setup):
    from sdumc_tpu.parallel import (llama_specs, make_mesh,
                                    replicated_sharding, shard_params)

    _, cfg_s, _, ms, _, ps, ids = setup
    mesh = make_mesh(data_parallel=4, model_parallel=2)
    ref = ms.apply({"params": ps}, input_ids=ids)["logits"]
    sharded = shard_params(ps, mesh, llama_specs(ps, mesh))
    ids_r = jax.device_put(ids, replicated_sharding(mesh))
    tp = jax.jit(lambda p, i: ms.apply({"params": p}, input_ids=i)["logits"])(
        sharded, ids_r)
    np.testing.assert_allclose(np.asarray(tp), np.asarray(ref), atol=1e-4)


@pytest.mark.parametrize("taps", [(-4, -3, -2, -1), (-3,), (0, -1), (-9, -1)])
def test_tap_sum_equals_stacked_hidden_sum(setup, taps):
    """LlamaModel.tap_sum_layers must equal summing the stacked
    hidden_states at the same (clamped) indices — scan AND unrolled —
    including the embed entry (0), the post-norm final (-1), and the
    shallow-model clamp (|i| > num_layers+1 drops, HF slice semantics)."""
    cfg_u, cfg_s, model_u, model_s, params_u, params_s, ids = setup

    for model, params in ((model_u, params_u), (model_s, params_s)):
        out = model.apply({"params": params}, input_ids=ids,
                          output_hidden_states=True,
                          tap_sum_layers=taps)
        hs = out["hidden_states"]
        idxs = {i % len(hs) for i in taps if -len(hs) <= i < len(hs)}
        want = sum(np.asarray(hs[i], np.float32) for i in sorted(idxs))
        np.testing.assert_allclose(np.asarray(out["tap_sum"]), want,
                                   rtol=1e-6, atol=1e-6)
