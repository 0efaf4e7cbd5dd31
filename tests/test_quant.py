"""Weight-only int8 quantization (ops/quant.py): numerics bounds + the
quantized decode path. CPU-hermetic, tiny configs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdumc_tpu.models.llama import LlamaConfig, LlamaForCausalLM
from sdumc_tpu.ops.quant import (dequantize_kernel, quantize_kernel,
                                 quantize_params)


def test_quantize_roundtrip_error_bound():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(64, 96)).astype(np.float32) * 0.02)
    q, s = quantize_kernel(w)
    assert q.dtype == jnp.int8 and s.shape == (96,)
    back = dequantize_kernel(q, s, jnp.float32)
    # symmetric per-channel: max error is half a quantization step
    step = np.asarray(s)[None, :]
    assert np.all(np.abs(np.asarray(back - w)) <= 0.5 * step + 1e-7)


def test_quantize_stacked_kernel_per_layer_scales():
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.normal(size=(3, 16, 8)).astype(np.float32))
    w = w.at[1].multiply(10.0)  # layer 1 has 10x the dynamic range
    q, s = quantize_kernel(w)
    assert s.shape == (3, 8)
    assert float(jnp.mean(s[1])) > 5 * float(jnp.mean(s[0]))
    back = dequantize_kernel(q, s, jnp.float32)
    rel = float(jnp.linalg.norm(back - w) / jnp.linalg.norm(w))
    assert rel < 2e-2, rel


@pytest.fixture(scope="module")
def tiny_pair():
    cfg = LlamaConfig.tiny(scan_layers=True)
    model = LlamaForCausalLM(cfg)
    ids = jnp.asarray(np.random.default_rng(2).integers(0, cfg.vocab_size, (2, 12)))
    params = model.init(jax.random.PRNGKey(0), input_ids=ids)["params"]
    qcfg = LlamaConfig.tiny(scan_layers=True, quant="int8")
    qmodel = LlamaForCausalLM(qcfg)
    qparams = quantize_params(params)
    return cfg, model, params, qcfg, qmodel, qparams, ids


def test_quantized_tree_structure(tiny_pair):
    _, _, params, _, qmodel, qparams, ids = tiny_pair
    keys = {"/".join(str(k) for k in path) for path in
            [p for p, _ in jax.tree_util.tree_flatten_with_path(qparams)[0]]}
    assert any("kernel_q" in k for k in keys)
    assert not any(k.endswith("['kernel']") for k in keys)
    # embeddings and norm scales untouched
    assert any("embedding" in k for k in keys)
    # structure must match what the quant model expects
    want = jax.eval_shape(
        lambda: qmodel.init(jax.random.PRNGKey(0), input_ids=ids))["params"]
    assert (jax.tree_util.tree_structure(want)
            == jax.tree_util.tree_structure(qparams))
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(want)[0],
            jax.tree_util.tree_flatten_with_path(qparams)[0]):
        assert a.shape == b.shape and a.dtype == b.dtype, (pa, a, b.shape, b.dtype)


def test_quantized_forward_close_to_full_precision(tiny_pair):
    cfg, model, params, _, qmodel, qparams, ids = tiny_pair
    ref = model.apply({"params": params}, input_ids=ids,
                      output_hidden_states=True)
    got = qmodel.apply({"params": qparams}, input_ids=ids,
                       output_hidden_states=True)
    h_ref = ref["last_hidden_state"]
    h_got = got["last_hidden_state"]
    rel = float(jnp.linalg.norm(h_got - h_ref) / jnp.linalg.norm(h_ref))
    assert rel < 0.05, rel
    # next-token argmax agrees on most positions (regression canary for the
    # scale placement — a transposed scale axis destroys this immediately)
    agree = float(jnp.mean(
        (jnp.argmax(ref["logits"], -1) == jnp.argmax(got["logits"], -1))))
    assert agree > 0.8, agree


def test_quantized_beam_decode_runs(tiny_pair):
    from sdumc_tpu.models.generation import beam_generate_batched

    cfg, model, params, qcfg, qmodel, qparams, _ = tiny_pair
    rng = np.random.default_rng(3)
    pe = jnp.asarray(rng.normal(size=(2, 10, cfg.hidden_size)).astype(np.float32) * 0.1)
    lens = jnp.asarray([10, 7], jnp.int32)

    def run(m, p):
        apply_fn = lambda **kw: m.apply({"params": p}, **kw)  # noqa: E731
        embed_fn = lambda t: p["model"]["embed_tokens"]["embedding"][t]  # noqa: E731
        return beam_generate_batched(apply_fn, pe, m.cfg, embed_fn=embed_fn,
                                     prompt_len=lens, num_beams=4,
                                     max_new_tokens=6, eos_id=-1)

    ref = jax.jit(lambda p: run(model, p))(params)
    got = jax.jit(lambda p: run(qmodel, p))(qparams)
    assert got["tokens"].shape == ref["tokens"].shape
    assert int(np.asarray(got["n_steps"]).max()) == 6
    # taps exist and are finite — the harvested feat4 stream stays usable
    assert np.isfinite(np.asarray(got["taps"], np.float32)).all()


def test_w8a8_forward_close_to_full_precision(tiny_pair):
    """quant="w8a8": dynamic per-row activation int8 + native int8xint8
    dot. Numerics drift a bit past weight-only (two quantizers) but must
    stay within the same usability envelope."""
    cfg, model, params, _, _, qparams, ids = tiny_pair
    wcfg = LlamaConfig.tiny(scan_layers=True, quant="w8a8")
    wmodel = LlamaForCausalLM(wcfg)
    ref = model.apply({"params": params}, input_ids=ids,
                      output_hidden_states=True)
    got = wmodel.apply({"params": qparams}, input_ids=ids,
                       output_hidden_states=True)
    rel = float(jnp.linalg.norm(got["last_hidden_state"] - ref["last_hidden_state"])
                / jnp.linalg.norm(ref["last_hidden_state"]))
    assert rel < 0.08, rel
    agree = float(jnp.mean(
        (jnp.argmax(ref["logits"], -1) == jnp.argmax(got["logits"], -1))))
    assert agree > 0.7, agree


def test_w8a8_beam_decode_runs(tiny_pair):
    from sdumc_tpu.models.generation import beam_generate_batched

    cfg, model, params, _, _, qparams, _ = tiny_pair
    wcfg = LlamaConfig.tiny(scan_layers=True, quant="w8a8")
    wmodel = LlamaForCausalLM(wcfg)
    rng = np.random.default_rng(4)
    pe = jnp.asarray(rng.normal(size=(2, 10, cfg.hidden_size)).astype(np.float32) * 0.1)
    lens = jnp.asarray([10, 7], jnp.int32)
    apply_fn = lambda **kw: wmodel.apply({"params": qparams}, **kw)  # noqa: E731
    embed_fn = lambda t: qparams["model"]["embed_tokens"]["embedding"][t]  # noqa: E731
    got = jax.jit(lambda p: beam_generate_batched(
        apply_fn, pe, wcfg, embed_fn=embed_fn, prompt_len=lens,
        num_beams=4, max_new_tokens=6, eos_id=-1))(qparams)
    assert int(np.asarray(got["n_steps"]).max()) == 6
    assert np.isfinite(np.asarray(got["taps"], np.float32)).all()


@pytest.mark.parametrize("scan", [True, False])
def test_int8_kv_cache_decode_close_to_bf16_cache(scan):
    """kv_quant="int8": decode with a quantized KV cache tracks the exact-
    cache run closely (per-(token, head) symmetric scales; the current
    chunk stays exact — llama.py quantize_kv). Pins the feat4 tap stream,
    the artifact the reference harvests (extract_wavlm_vicuna.py:245-264)."""
    from sdumc_tpu.models.generation import beam_generate_batched

    cfg = LlamaConfig.tiny(scan_layers=scan)
    kcfg = LlamaConfig.tiny(scan_layers=scan, kv_quant="int8")
    model, kmodel = LlamaForCausalLM(cfg), LlamaForCausalLM(kcfg)
    rng = np.random.default_rng(11)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(1, 8)))
    params = model.init(jax.random.PRNGKey(0), input_ids=ids)["params"]

    pe = jnp.asarray(rng.normal(size=(2, 12, cfg.hidden_size)) * 0.1,
                     jnp.float32)
    lens = jnp.asarray([12, 9], jnp.int32)

    def run(m):
        apply_fn = lambda **kw: m.apply({"params": params}, **kw)  # noqa: E731
        embed_fn = lambda t: params["model"]["embed_tokens"]["embedding"][t]  # noqa: E731
        return beam_generate_batched(apply_fn, pe, m.cfg, embed_fn=embed_fn,
                                     prompt_len=lens, num_beams=3,
                                     max_new_tokens=5, eos_id=-1)

    ref = jax.jit(lambda: run(model))()
    got = jax.jit(lambda: run(kmodel))()
    ref_taps = np.asarray(ref["taps"], np.float32)
    got_taps = np.asarray(got["taps"], np.float32)
    assert np.isfinite(got_taps).all()
    rel = (np.linalg.norm(got_taps - ref_taps)
           / max(np.linalg.norm(ref_taps), 1e-9))
    assert rel < 0.02, rel
    # int8 codes + f32 scales actually in the cache (not silently bf16)
    from sdumc_tpu.models.llama import init_cache

    cache = init_cache(kcfg, 2, 16)
    leaf = cache["k"] if scan else cache[0]["k"]
    assert leaf.dtype == jnp.int8
    assert ("k_scale" in cache) if scan else ("k_scale" in cache[0])


def test_int8_kv_cache_composes_with_w8a8_weights():
    """The VERDICT-target production combo: w8a8 weights + int8 KV cache."""
    from sdumc_tpu.models.generation import greedy_generate
    from sdumc_tpu.ops.quant import quantize_params

    cfg = LlamaConfig.tiny(scan_layers=True)
    model = LlamaForCausalLM(cfg)
    rng = np.random.default_rng(5)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(1, 8)))
    params = model.init(jax.random.PRNGKey(1), input_ids=ids)["params"]

    ccfg = LlamaConfig.tiny(scan_layers=True, quant="w8a8", kv_quant="int8")
    cmodel = LlamaForCausalLM(ccfg)
    cparams = quantize_params(params, mode="w8a8")

    pe = jnp.asarray(rng.normal(size=(1, 10, cfg.hidden_size)) * 0.1,
                     jnp.float32)

    def run(m, p):
        apply_fn = lambda **kw: m.apply({"params": p}, **kw)  # noqa: E731
        embed_fn = lambda t: p["model"]["embed_tokens"]["embedding"][t]  # noqa: E731
        return greedy_generate(apply_fn, pe, m.cfg, embed_fn=embed_fn,
                               max_new_tokens=4, eos_id=-1)

    ref = jax.jit(lambda: run(model, params))()
    got = jax.jit(lambda: run(cmodel, cparams))()
    assert got["taps"].shape == ref["taps"].shape
    got_taps = np.asarray(got["taps"], np.float32)
    assert np.isfinite(got_taps).all()
    rel = (np.linalg.norm(got_taps - np.asarray(ref["taps"], np.float32))
           / max(np.linalg.norm(np.asarray(ref["taps"])), 1e-9))
    assert rel < 0.05, rel  # w8a8 weight shift dominates; kv adds ~0.1-1%
