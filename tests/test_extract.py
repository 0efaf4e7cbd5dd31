"""Extraction-stage tests: projector parity (AST-golden from the reference),
feat4 end-to-end vs an HF-built reference pipeline, text span detection."""

import ast
import pathlib
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from sdumc_tpu.extract.projector import EncoderProjectorConcat, projector_params_from_torch


@pytest.fixture(scope="module")
def ref_projector_cls():
    """Execute just the reference EncoderProjectorConcat class (its module
    has unresolvable imports)."""
    path = pathlib.Path(
        "/root/reference/feature_extraction/llm4wav/extract_wavlm_vicuna.py"
    )
    if not path.exists():
        pytest.skip("reference unavailable")
    tree = ast.parse(path.read_text())
    cls = [n for n in tree.body
           if isinstance(n, ast.ClassDef) and n.name == "EncoderProjectorConcat"]
    glb = {"torch": torch, "nn": torch.nn}
    exec(compile(ast.Module(body=cls, type_ignores=[]), "<ref>", "exec"), glb)
    return glb["EncoderProjectorConcat"]


def test_projector_parity(ref_projector_cls):
    torch.manual_seed(0)
    tp = ref_projector_cls(5, 16, 24)  # k=5, encoder 16, llm 24
    tp.eval()
    params = projector_params_from_torch(
        {"encoder_projector." + k: v for k, v in tp.state_dict().items()}
    )
    jp = EncoderProjectorConcat(k=5, encoder_dim=16, hidden_dim=2048, llm_dim=24)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 23, 16)).astype(np.float32)  # 23 -> discard 3 -> T=4
    with torch.no_grad():
        ref = tp(torch.tensor(x)).numpy()
    got = np.asarray(jp.apply({"params": params}, jnp.array(x)))
    assert ref.shape == got.shape == (2, 4, 24)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


class FakeTokenizer:
    """Whitespace tokenizer with a BOS special token (LLaMA-like surface)."""

    eos_token_id = 2

    def __init__(self):
        self.vocab = {"<s>": 1}

    def __call__(self, text, **kw):
        ids = [1] + [3 + (hash(w) % 90) for w in text.split()]
        return {"input_ids": ids}

    def decode(self, ids):
        # non-invertible hash vocab; emulate by storing last encoding
        return " ".join("<s>" if i == 1 else f"w{i}" for i in ids)


def test_find_token_span_with_bos():
    from sdumc_tpu.extract.text import find_token_span

    class Tok:
        def __call__(self, text, **kw):
            self.words = text.split()
            return {"input_ids": list(range(1, len(self.words) + 2))}

        def decode(self, ids):
            # id 1 is BOS ("<s>"), others map back to probe words
            toks = ["<s>" if i == 1 else self.words[i - 2] for i in ids]
            return " ".join(toks)

    start, end = find_token_span(Tok())
    assert (start, end) == (1, 0)


class InvertibleTok:
    """Deterministic whitespace tokenizer with BOS, invertible decode —
    enough surface for find_token_span + extract_text_features."""

    def __init__(self):
        self.word2id = {}
        self.id2word = {1: "<s>"}

    def __call__(self, text, **kw):
        ids = [1]
        for w in text.split():
            if w not in self.word2id:
                i = 3 + len(self.word2id)
                self.word2id[w] = i
                self.id2word[i] = w
            ids.append(self.word2id[w])
        return {"input_ids": ids}

    def decode(self, ids):
        return " ".join(self.id2word.get(i, "?") for i in ids)


def test_batched_bucketed_text_extraction_is_pad_invariant():
    """extract_text_features (bucketed, batched, dummy-row padded) must equal
    an exact-length per-sentence forward — the batch-1 loop it replaced
    (reference extract_text_embedding_huggingface.py:139-282)."""
    from sdumc_tpu.extract.text import extract_text_features
    from sdumc_tpu.models.llama import LlamaConfig, LlamaModel

    cfg = LlamaConfig.tiny(vocab_size=64)
    model = LlamaModel(cfg)
    tok = InvertibleTok()
    sentences = [
        "a b", "c d e f g", "a", "h i j k l m n o p q r s",
        "b c", "d", "q r s t u v w x y z aa bb cc dd ee ff gg",
    ]
    ids0 = jnp.asarray([[1, 2, 3]])
    params = model.init(jax.random.PRNGKey(0), input_ids=ids0)["params"]

    got = extract_text_features(
        model, params, tok, sentences,
        layer_ids=(-4, -3, -2, -1), buckets=(4, 8, 16), batch_size=3,
    )

    for sent, feat in zip(sentences, got):
        ids = tok(sent)["input_ids"]
        out = model.apply(
            {"params": params}, input_ids=jnp.asarray([ids]),
            output_hidden_states=True,
        )
        hs = out["hidden_states"]
        ref = sum(np.asarray(hs[i]) for i in (-4, -3, -2, -1))[0, 1:]
        assert feat.shape == ref.shape  # BOS stripped, no padding
        np.testing.assert_allclose(feat, ref, rtol=2e-5, atol=2e-5)


def test_feat4_extractor_matches_hf_pipeline(ref_projector_cls):
    """Full bridge: projector + prompt-free beam-4 generate with taps, vs the
    same computation through torch/HF (the reference's forward,
    extract_wavlm_vicuna.py:205-264)."""
    from transformers import LlamaConfig as HFConfig
    from transformers import LlamaForCausalLM as HFLlama

    from sdumc_tpu.convert.hf_llama import config_from_hf, hf_llama_to_params
    from sdumc_tpu.extract.llm4wav import Feat4Extractor
    from sdumc_tpu.models.llama import LlamaConfig

    hf_cfg = HFConfig(
        vocab_size=96, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=256, attn_implementation="eager",
        eos_token_id=2, bos_token_id=1, pad_token_id=0,
    )
    torch.manual_seed(3)
    hf = HFLlama(hf_cfg).eval()
    cfg = config_from_hf(hf_cfg)
    cfg = LlamaConfig(**{**cfg.__dict__, "dtype": jnp.float32})
    params = {"model": hf_llama_to_params(hf.state_dict())["model"],
              "lm_head": hf_llama_to_params(hf.state_dict())["lm_head"]}

    torch.manual_seed(4)
    tproj = ref_projector_cls(5, 16, 48).eval()
    proj_params = projector_params_from_torch(tproj.state_dict())

    rng = np.random.default_rng(5)
    wavlm_feats = rng.normal(size=(27, 16)).astype(np.float32)  # -> 5 frames

    # --- torch reference pipeline
    with torch.no_grad():
        embeds = tproj(torch.tensor(wavlm_feats[None]))
        out = hf.generate(
            inputs_embeds=embeds, max_new_tokens=10, num_beams=4,
            do_sample=False, output_hidden_states=True,
            return_dict_in_generate=True,
        )
    hs = out.hidden_states[1:]
    ref_taps = np.stack(
        [torch.stack(step[-4:])[:, 0, 0, :].sum(dim=0).numpy() for step in hs]
    )

    # --- ours
    extractor = Feat4Extractor(
        None, params, cfg,
        {"linear1": proj_params["linear1"], "linear2": proj_params["linear2"]},
        tokenizer=None, num_beams=4, max_new_tokens=10,
    )
    # projector must discard the remainder frames identically
    got = extractor(wavlm_feats)
    n = min(len(got["taps"]), len(ref_taps))
    assert n > 0
    np.testing.assert_allclose(got["taps"][:n], ref_taps[:n], rtol=3e-4, atol=3e-4)
