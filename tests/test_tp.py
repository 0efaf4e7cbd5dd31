"""Tensor parallelism for the extractor graphs (LLaMA / WavLM).

TP(2) and TP(4) over the virtual mesh's `model` axis must produce the same
logits/hidden states as the fully replicated forward — the sharding rules
(parallel/sharding.py) only change layout, GSPMD inserts the collectives.
Mirrors the reference's accelerate.dispatch_model multi-GPU sharding of the
7B extractors (extract_text_embedding_huggingface.py:204-210).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from sdumc_tpu.models.llama import LlamaConfig, LlamaForCausalLM
from sdumc_tpu.models.wavlm import WavLMConfig, WavLMModel
from sdumc_tpu.parallel import make_mesh
from sdumc_tpu.parallel.sharding import (
    llama_specs,
    partition_specs,
    shard_params,
    tp_sharding_summary,
    wavlm_specs,
    LLAMA_RULES,
)


def _replicate_inputs(mesh, *arrays):
    return tuple(jax.device_put(a, NamedSharding(mesh, P())) for a in arrays)


@pytest.fixture(scope="module")
def llama_setup():
    cfg = LlamaConfig.tiny(num_heads=4, hidden_size=64, intermediate_size=128)
    model = LlamaForCausalLM(cfg)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, cfg.vocab_size, (2, 12)))
    params = model.init(jax.random.PRNGKey(0), input_ids=ids)["params"]
    ref = model.apply({"params": params}, input_ids=ids, output_hidden_states=True)
    return model, params, ids, ref


@pytest.mark.parametrize("tp", [2, 4])
def test_llama_tp_matches_replicated(llama_setup, tp):
    model, params, ids, ref = llama_setup
    mesh = make_mesh(data_parallel=8 // tp, model_parallel=tp)
    specs = llama_specs(params, mesh)
    sharded = shard_params(params, mesh, specs)
    (ids_r,) = _replicate_inputs(mesh, ids)

    out = jax.jit(
        lambda p, i: model.apply(
            {"params": p}, input_ids=i, output_hidden_states=True
        )
    )(sharded, ids_r)

    np.testing.assert_allclose(
        np.asarray(out["logits"]), np.asarray(ref["logits"]), rtol=2e-5, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(out["hidden_states"][-3]),
        np.asarray(ref["hidden_states"][-3]),
        rtol=2e-5, atol=2e-5,
    )


def test_llama_specs_shard_the_big_tensors(llama_setup):
    model, params, ids, _ = llama_setup
    mesh = make_mesh(data_parallel=4, model_parallel=2)
    specs = llama_specs(params, mesh)
    flat = dict(
        ("/".join(k.key for k in path), spec)
        for path, spec in jax.tree_util.tree_flatten_with_path(
            specs, is_leaf=lambda x: isinstance(x, P)
        )[0]
    )
    assert flat["model/layers_0/self_attn/q_proj/kernel"] == P(None, "model")
    assert flat["model/layers_0/self_attn/o_proj/kernel"] == P("model", None)
    assert flat["model/layers_0/mlp/down_proj/kernel"] == P("model", None)
    assert flat["model/layers_0/input_layernorm/scale"] == P()
    summary = tp_sharding_summary(params, specs)
    assert "sharded" in summary


def test_indivisible_dims_fall_back_to_replicated(llama_setup):
    model, params, ids, _ = llama_setup
    # hidden=64 is not divisible by a 48-way model axis... simulate with a
    # rule check at axis_size 48 by constructing specs against a fake mesh
    # shape via partition_specs' divisibility guard (axis size 8 on 4 heads
    # is fine for hidden=64; use 128-way to force fallback).
    mesh = make_mesh(data_parallel=4, model_parallel=2)
    # monkeypatch: rules demanding divisibility by 2 pass; force failure by
    # using a dim-3 tensor path
    odd = {"q_proj": {"kernel": np.zeros((3, 5), np.float32)}}
    specs = partition_specs(odd, LLAMA_RULES, mesh)
    assert specs["q_proj"]["kernel"] == P()  # 5 % 2 != 0 -> replicated


@pytest.mark.parametrize("tp", [2, 4])
def test_wavlm_tp_matches_replicated(tp):
    cfg = WavLMConfig.tiny()
    model = WavLMModel(cfg)
    wav = jnp.asarray(
        np.random.default_rng(1).normal(size=(2, 800)).astype(np.float32)
    )
    params = model.init(jax.random.PRNGKey(0), wav)["params"]
    ref = model.apply({"params": params}, wav, output_hidden_states=True)

    mesh = make_mesh(data_parallel=8 // tp, model_parallel=tp)
    specs = wavlm_specs(params, mesh)
    sharded = shard_params(params, mesh, specs)
    (wav_r,) = _replicate_inputs(mesh, wav)
    out = jax.jit(
        lambda p, w: model.apply({"params": p}, w, output_hidden_states=True)
    )(sharded, wav_r)

    np.testing.assert_allclose(
        np.asarray(out["hidden_states"][-2]),
        np.asarray(ref["hidden_states"][-2]),
        rtol=2e-5, atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out["last_hidden_state"]),
        np.asarray(ref["last_hidden_state"]),
        rtol=2e-5, atol=2e-5,
    )


def test_tp_beam_generate_matches_replicated():
    """TP-sharded params through the whole while_loop beam decode (the
    feat4 --tp path, extract/llm4wav.py) must reproduce the replicated
    decode: same tokens, taps to float tolerance."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from sdumc_tpu.models.generation import beam_generate
    from sdumc_tpu.models.llama import LlamaConfig, LlamaForCausalLM
    from sdumc_tpu.parallel import make_mesh
    from sdumc_tpu.parallel.sharding import llama_specs, shard_params

    cfg = LlamaConfig.tiny(num_heads=4, hidden_size=64)
    model = LlamaForCausalLM(cfg)
    rng = np.random.default_rng(0)
    prompt = jnp.asarray((rng.normal(size=(1, 6, cfg.hidden_size)) * 0.5)
                         .astype(np.float32))
    params = model.init(jax.random.PRNGKey(3),
                        input_ids=jnp.zeros((1, 4), jnp.int32))["params"]

    def gen(p, pe):
        def apply_fn(**kw):
            return model.apply({"params": p}, **kw)

        def embed_fn(ids):
            return p["model"]["embed_tokens"]["embedding"][ids]

        return beam_generate(apply_fn, pe, cfg, embed_fn=embed_fn,
                             num_beams=4, max_new_tokens=12, eos_id=2)

    ref = jax.jit(gen)(params, prompt)

    mesh = make_mesh(data_parallel=1, model_parallel=2)
    sharded = shard_params(params, mesh, llama_specs(params, mesh))
    got = jax.jit(gen)(sharded, prompt)

    np.testing.assert_array_equal(np.asarray(got["tokens"]),
                                  np.asarray(ref["tokens"]))
    assert int(got["n_steps"]) == int(ref["n_steps"])
    n = int(ref["n_steps"])
    np.testing.assert_allclose(np.asarray(got["taps"])[:n],
                               np.asarray(ref["taps"])[:n],
                               rtol=2e-4, atol=2e-4)
