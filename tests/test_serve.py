"""Serving-export roundtrip: the dual-view eval program as StableHLO
artifacts (sdumc_tpu/serve/export.py) must reproduce the live jitted eval
after save -> load in a fresh object, including bucket dispatch and
partial-batch padding."""

import pytest

import numpy as np

import jax
import jax.numpy as jnp

from sdumc_tpu.core.config import ModelConfig
from sdumc_tpu.models import get_model
from sdumc_tpu.serve import ServingBundle
from sdumc_tpu.train.step import make_eval_step

DIMS = (12, 24, 12, 24)


def _model_and_params():
    cfg = ModelConfig(input_dims=DIMS[:3], general_dim=16, layers=(16, 8),
                      fused_layers=(16, 16))
    model = get_model(cfg)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((2, 4, DIMS[0])), jnp.zeros((2, 4, DIMS[1])),
        jnp.zeros((2, 4, DIMS[2])),
    )["params"]
    return model, params


@pytest.mark.slow  # >20 s on this 1-core host; full suite still runs it
def test_serving_bundle_roundtrip(tmp_path):
    model, params = _model_and_params()
    B = 4
    combos = [(8, 8, 8, 8), (16, 8, 8, 8)]
    bundle = ServingBundle.build(model, params, DIMS, combos, B)
    bundle.save(str(tmp_path / "bundle"))
    loaded = ServingBundle.load(str(tmp_path / "bundle"))

    rng = np.random.default_rng(0)
    Bp = 3  # partial batch
    batch = {
        "audio": rng.normal(size=(Bp, 5, DIMS[0])).astype(np.float32),
        "text": rng.normal(size=(Bp, 7, DIMS[1])).astype(np.float32),
        "video": rng.normal(size=(Bp, 6, DIMS[2])).astype(np.float32),
        "feat4": rng.normal(size=(Bp, 4, DIMS[3])).astype(np.float32),
    }
    v0, v1 = loaded(batch)
    assert v0.shape == v1.shape == (Bp,)

    # reference: the live jitted eval on the same padded shapes
    eval_step = make_eval_step(model)
    padded = {}
    for k, tb in zip(("audio", "text", "video", "feat4"), combos[0]):
        x = batch[k]
        out = np.zeros((B, tb, x.shape[2]), np.float32)
        out[:Bp, : x.shape[1]] = x
        padded[k] = jnp.asarray(out)
    padded["vals"] = jnp.zeros((B,), jnp.float32)
    padded["t_max"] = tuple(jnp.int32(batch[k].shape[1])
                            for k in ("audio", "text", "video", "feat4"))
    r0, r1 = eval_step(params, padded)
    np.testing.assert_allclose(v0, np.asarray(r0)[:Bp], rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(v1, np.asarray(r1)[:Bp], rtol=1e-6, atol=1e-6)

    # longer audio dispatches to the bigger bucket
    batch["audio"] = rng.normal(size=(Bp, 12, DIMS[0])).astype(np.float32)
    v0b, _ = loaded(batch)
    assert v0b.shape == (Bp,)
    # too-long input errors clearly
    batch["audio"] = rng.normal(size=(Bp, 64, DIMS[0])).astype(np.float32)
    try:
        loaded(batch)
        assert False, "expected ValueError for unfittable lengths"
    except ValueError as e:
        assert "bucket" in str(e)


@pytest.mark.slow
def test_decode_bundle_roundtrip(tmp_path):
    """The beam-decode extractor as exported StableHLO (DecodeBundle):
    save -> load in a fresh object must reproduce the live
    beam_generate_batched exactly (tokens, steps, taps), including the
    left-pad prompt-bucket dispatch and partial clip batches."""
    from sdumc_tpu.models.generation import beam_generate_batched
    from sdumc_tpu.models.llama import LlamaConfig, LlamaForCausalLM
    from sdumc_tpu.serve.export import DecodeBundle

    cfg = LlamaConfig.tiny()
    model = LlamaForCausalLM(cfg)
    params = model.init(jax.random.PRNGKey(0),
                        input_ids=jnp.zeros((1, 4), jnp.int32))["params"]
    params = jax.tree_util.tree_map(np.asarray, params)

    bundle = DecodeBundle.build(cfg, params, buckets=(8, 16), gen_batch=3,
                                max_new_tokens=6, eos_id=2)
    bundle.save(str(tmp_path / "decode_bundle"))
    loaded = DecodeBundle.load(str(tmp_path / "decode_bundle"))

    rng = np.random.default_rng(0)
    # two clips (partial batch), lengths 5 and 7 -> bucket 8
    prompts = [(rng.normal(size=(P, cfg.hidden_size)) * 0.5).astype(np.float32)
               for P in (5, 7)]
    out = loaded(prompts)
    assert out["tokens"].shape == (2, 6)

    # live engine on the same left-padded batch for the exact comparison
    pe = np.zeros((3, 8, cfg.hidden_size), np.float32)
    pl = np.ones((3,), np.int32)
    for i, p in enumerate(prompts):
        pe[i, 8 - p.shape[0]:] = p
        pl[i] = p.shape[0]
    live = beam_generate_batched(
        lambda **kw: model.apply({"params": params}, **kw),
        jnp.asarray(pe), cfg,
        embed_fn=lambda ids: jnp.asarray(
            params["model"]["embed_tokens"]["embedding"])[ids],
        prompt_len=jnp.asarray(pl), num_beams=4, max_new_tokens=6, eos_id=2)
    np.testing.assert_array_equal(out["tokens"], np.asarray(live["tokens"])[:2])
    np.testing.assert_array_equal(out["n_steps"], np.asarray(live["n_steps"])[:2])
    np.testing.assert_allclose(out["taps"], np.asarray(live["taps"])[:2],
                               rtol=1e-5, atol=1e-5)

    # dispatch: a 13-long prompt must pick bucket 16; an over-long one errors
    out16 = loaded([(rng.normal(size=(13, cfg.hidden_size)) * 0.5
                     ).astype(np.float32)])
    assert out16["tokens"].shape == (1, 6)
    with pytest.raises(ValueError):
        loaded([np.zeros((17, cfg.hidden_size), np.float32)])


@pytest.mark.slow
def test_decode_export_cli(tmp_path):
    """python -m sdumc_tpu.cli.export --decode builds a loadable
    DecodeBundle straight from an HF checkpoint dir (the reference's
    Vicuna layout), including the scan-layers restack."""
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig as HFConfig
    from transformers import LlamaForCausalLM as HFLlama

    hf_cfg = HFConfig(
        vocab_size=96, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=256, eos_token_id=2, bos_token_id=1,
        pad_token_id=0)
    torch.manual_seed(0)
    hf = HFLlama(hf_cfg)
    llm_dir = str(tmp_path / "hf_llama")
    hf.save_pretrained(llm_dir)

    from sdumc_tpu.cli.export import main as export_main
    from sdumc_tpu.serve.export import DecodeBundle

    out_dir = str(tmp_path / "bundle")
    export_main(["--decode", "--llm_dir", llm_dir, "--out_dir", out_dir,
                 "--prompt_buckets", "8", "--gen_batch", "2",
                 "--max_new_tokens", "4", "--platforms", "native"])
    bundle = DecodeBundle.load(out_dir)
    rng = np.random.default_rng(0)
    out = bundle([(rng.normal(size=(5, 48)) * 0.5).astype(np.float32)])
    assert out["tokens"].shape == (1, 4)
    assert int(out["n_steps"][0]) >= 1
