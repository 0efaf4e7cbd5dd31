"""Decode-loop parity vs HF generate on a tiny random LLaMA (no download).

The beam test replicates the reference's exact feat4 harvest
(extract_wavlm_vicuna.py:245-264): beam-4 generate from prompt embeddings,
per-step last-4-layer hidden states of the leading beam, summed.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from sdumc_tpu.convert.hf_llama import config_from_hf, hf_llama_to_params
from sdumc_tpu.models.generation import beam_generate, greedy_generate
from sdumc_tpu.models.llama import LlamaConfig, LlamaForCausalLM


@pytest.fixture(scope="module")
def setup():
    from transformers import LlamaConfig as HFConfig
    from transformers import LlamaForCausalLM as HFLlama

    hf_cfg = HFConfig(
        vocab_size=96, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=256, attn_implementation="eager",
        eos_token_id=2, bos_token_id=1, pad_token_id=0,
    )
    torch.manual_seed(1)
    hf = HFLlama(hf_cfg).eval()
    cfg = config_from_hf(hf_cfg)
    cfg = LlamaConfig(**{**cfg.__dict__, "dtype": jnp.float32})
    params = hf_llama_to_params(hf.state_dict())
    model = LlamaForCausalLM(cfg)

    def apply_fn(**kw):
        return model.apply({"params": params}, **kw)

    embedding = jnp.asarray(params["model"]["embed_tokens"]["embedding"])

    def embed_fn(ids):
        return embedding[ids]

    return hf, cfg, apply_fn, embed_fn


def _prompt(seed, P, D):
    rng = np.random.default_rng(seed)
    return (rng.normal(size=(1, P, D)) * 0.5).astype(np.float32)


@pytest.mark.fast  # pre-commit smoke tier: one real decode-vs-HF pin
def test_greedy_matches_hf(setup):
    hf, cfg, apply_fn, embed_fn = setup
    prompt = _prompt(0, 5, cfg.hidden_size)
    with torch.no_grad():
        hf_out = hf.generate(
            inputs_embeds=torch.tensor(prompt), max_new_tokens=12,
            do_sample=False, num_beams=1,
        )
    ours = greedy_generate(apply_fn, jnp.array(prompt), cfg,
                           embed_fn=embed_fn, max_new_tokens=12)
    n = int(ours["n_steps"])
    hf_ids = hf_out[0].numpy()
    np.testing.assert_array_equal(np.asarray(ours["tokens"])[: len(hf_ids)], hf_ids)
    assert n >= len(hf_ids) - 1


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_beam4_sequence_and_taps_match_hf(setup, seed):
    hf, cfg, apply_fn, embed_fn = setup
    prompt = _prompt(seed, 6, cfg.hidden_size)
    max_new = 16
    with torch.no_grad():
        hf_out = hf.generate(
            inputs_embeds=torch.tensor(prompt), max_new_tokens=max_new,
            num_beams=4, do_sample=False, min_length=1, top_p=1.0,
            repetition_penalty=1.0, length_penalty=1.0, temperature=1.0,
            output_hidden_states=True, return_dict_in_generate=True,
        )
    hf_ids = hf_out.sequences[0].numpy()
    # reference feat4 harvest (extract_wavlm_vicuna.py:260-264)
    hs = hf_out.hidden_states[1:]
    ref_taps = np.stack(
        [torch.stack(step[-4:])[:, 0, 0, :].sum(dim=0).numpy() for step in hs]
    )

    ours = beam_generate(apply_fn, jnp.array(prompt), cfg, embed_fn=embed_fn,
                         num_beams=4, max_new_tokens=max_new, eos_id=2,
                         tap_layers=(-4, -3, -2, -1))
    n_tok = int(ours["n_tokens"])
    got_ids = np.asarray(ours["tokens"])

    # strip a trailing EOS from the HF sequence if present
    hf_core = hf_ids[:-1] if hf_ids[-1] == 2 and len(hf_ids) > n_tok else hf_ids
    np.testing.assert_array_equal(got_ids[: len(hf_core)], hf_core)

    n_steps = int(ours["n_steps"])
    got_taps = np.asarray(ours["taps"])[: min(n_steps, len(ref_taps))]
    np.testing.assert_allclose(
        got_taps, ref_taps[: len(got_taps)], rtol=3e-4, atol=3e-4
    )


@pytest.mark.parametrize("seed,bucket", [(0, 16), (1, 32), (2, 16)])
def test_bucketed_prompt_matches_exact_length(setup, seed, bucket):
    """Left-padded bucketed beam_generate (one program per bucket,
    extract/llm4wav.py) must reproduce the exact-length program exactly:
    same tokens, same taps, same step count."""
    hf, cfg, apply_fn, embed_fn = setup
    P = 6 + seed
    prompt = _prompt(seed, P, cfg.hidden_size)
    max_new = 12

    exact = beam_generate(apply_fn, jnp.array(prompt), cfg, embed_fn=embed_fn,
                          num_beams=4, max_new_tokens=max_new, eos_id=2)

    padded = np.zeros((1, bucket, cfg.hidden_size), np.float32)
    padded[:, bucket - P:] = prompt
    bucketed = beam_generate(apply_fn, jnp.array(padded), cfg,
                             embed_fn=embed_fn, num_beams=4,
                             max_new_tokens=max_new, eos_id=2,
                             prompt_len=jnp.int32(P))

    assert int(exact["n_steps"]) == int(bucketed["n_steps"])
    assert int(exact["n_tokens"]) == int(bucketed["n_tokens"])
    np.testing.assert_array_equal(
        np.asarray(exact["tokens"]), np.asarray(bucketed["tokens"]))
    np.testing.assert_allclose(
        np.asarray(exact["taps"]), np.asarray(bucketed["taps"]),
        rtol=1e-5, atol=1e-5)


@pytest.mark.slow  # >20 s on this 1-core host; full suite still runs it
def test_batched_generate_matches_solo_runs(setup):
    """beam_generate_batched (vmap lockstep over clips, extract/llm4wav.py
    --gen_batch) must give every clip exactly its solo-run tokens/taps even
    when clips finish at different steps."""
    from sdumc_tpu.models.generation import beam_generate_batched

    hf, cfg, apply_fn, embed_fn = setup
    bucket, max_new = 16, 12
    lens = [6, 9, 11]
    prompts, padded = [], np.zeros((3, bucket, cfg.hidden_size), np.float32)
    for i, P in enumerate(lens):
        p = _prompt(10 + i, P, cfg.hidden_size)
        prompts.append(p)
        padded[i, bucket - P:] = p[0]

    batched = beam_generate_batched(
        apply_fn, jnp.asarray(padded), cfg, embed_fn=embed_fn,
        prompt_len=jnp.asarray(lens, jnp.int32),
        num_beams=4, max_new_tokens=max_new, eos_id=2)

    for i, P in enumerate(lens):
        solo = beam_generate(
            apply_fn, jnp.asarray(prompts[i]), cfg, embed_fn=embed_fn,
            num_beams=4, max_new_tokens=max_new, eos_id=2)
        assert int(batched["n_steps"][i]) == int(solo["n_steps"]), i
        assert int(batched["n_tokens"][i]) == int(solo["n_tokens"]), i
        np.testing.assert_array_equal(
            np.asarray(batched["tokens"][i]), np.asarray(solo["tokens"]), err_msg=f"clip {i}")
        n = int(solo["n_steps"])
        np.testing.assert_allclose(
            np.asarray(batched["taps"][i])[:n], np.asarray(solo["taps"])[:n],
            rtol=1e-5, atol=1e-5, err_msg=f"clip {i}")


@pytest.mark.fast
def test_exact_topk_matches_lax_topk():
    """exact_topk (argmax sweeps — the TPU-fast replacement for the decode
    loop's sort-based lax.top_k) must match values AND indices, including
    tie-breaking (equal values -> ascending index), across shapes/dtypes."""
    from sdumc_tpu.models.generation import exact_topk

    rng = np.random.default_rng(0)
    for shape, k in (((4, 1000), 8), ((1, 33), 5), ((3, 64), 1)):
        x = rng.normal(size=shape).astype(np.float32)
        # inject ties
        x[..., 1] = x[..., 0]
        v_ref, i_ref = jax.lax.top_k(jnp.asarray(x), k)
        v_got, i_got = exact_topk(jnp.asarray(x), k)
        np.testing.assert_array_equal(np.asarray(v_got), np.asarray(v_ref))
        np.testing.assert_array_equal(np.asarray(i_got), np.asarray(i_ref))
