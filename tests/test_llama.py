"""LLaMA decoder parity vs transformers (tiny random config, no download)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from sdumc_tpu.convert.hf_llama import config_from_hf, hf_llama_to_params
from sdumc_tpu.models.llama import (
    LlamaConfig,
    LlamaForCausalLM,
    LlamaModel,
    cache_mask,
    init_cache,
)


@pytest.fixture(scope="module")
def hf_pair():
    from transformers import LlamaConfig as HFConfig
    from transformers import LlamaForCausalLM as HFLlama

    hf_cfg = HFConfig(
        vocab_size=128, hidden_size=64, intermediate_size=112,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=128, attn_implementation="eager",
    )
    torch.manual_seed(0)
    hf = HFLlama(hf_cfg).eval()
    cfg = config_from_hf(hf_cfg)
    cfg = LlamaConfig(**{**cfg.__dict__, "dtype": jnp.float32})
    params = hf_llama_to_params(hf.state_dict())
    return hf, cfg, params


def test_forward_logits_and_hidden_parity(hf_pair):
    hf, cfg, params = hf_pair
    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, size=(2, 11))
    with torch.no_grad():
        out_t = hf(torch.tensor(ids), output_hidden_states=True)
    model = LlamaForCausalLM(cfg)
    out_j = model.apply({"params": params}, input_ids=jnp.array(ids),
                        output_hidden_states=True)
    np.testing.assert_allclose(
        np.asarray(out_j["logits"]), out_t.logits.numpy(), rtol=2e-4, atol=2e-4
    )
    assert len(out_j["hidden_states"]) == len(out_t.hidden_states)
    for hj, ht in zip(out_j["hidden_states"], out_t.hidden_states):
        np.testing.assert_allclose(np.asarray(hj), ht.numpy(), rtol=2e-4, atol=2e-4)


def test_inputs_embeds_forward(hf_pair):
    hf, cfg, params = hf_pair
    rng = np.random.default_rng(1)
    embeds = rng.normal(size=(1, 7, cfg.hidden_size)).astype(np.float32)
    with torch.no_grad():
        out_t = hf.model(inputs_embeds=torch.tensor(embeds))
    model = LlamaModel(cfg)
    out_j = model.apply({"params": params["model"]}, inputs_embeds=jnp.array(embeds))
    np.testing.assert_allclose(
        np.asarray(out_j["last_hidden_state"]),
        out_t.last_hidden_state.numpy(), rtol=2e-4, atol=2e-4,
    )


def test_kv_cache_decode_matches_full_forward(hf_pair):
    """Prefill + single-token decode through the static cache must equal the
    full-sequence forward."""
    _, cfg, params = hf_pair
    model = LlamaForCausalLM(cfg)
    rng = np.random.default_rng(2)
    ids = jnp.array(rng.integers(0, cfg.vocab_size, size=(1, 9)))

    full = model.apply({"params": params}, input_ids=ids)["logits"]

    max_len = 16
    caches = init_cache(cfg, 1, max_len, dtype=jnp.float32)
    # prefill first 6 tokens
    pos = jnp.arange(6)[None]
    out = model.apply({"params": params}, input_ids=ids[:, :6], positions=pos,
                      attn_mask=cache_mask(pos, max_len), caches=caches)
    caches = out["caches"]
    logits = out["logits"][:, -1]
    np.testing.assert_allclose(np.asarray(logits), np.asarray(full[:, 5]),
                               rtol=2e-4, atol=2e-4)
    # decode tokens 6..8 one at a time
    for t in range(6, 9):
        pos = jnp.array([[t]])
        out = model.apply({"params": params}, input_ids=ids[:, t:t + 1],
                          positions=pos, attn_mask=cache_mask(pos, max_len),
                          caches=caches)
        caches = out["caches"]
        np.testing.assert_allclose(
            np.asarray(out["logits"][:, 0]), np.asarray(full[:, t]),
            rtol=2e-4, atol=2e-4,
        )
