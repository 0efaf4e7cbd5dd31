"""HF BloomModel -> sdumc_tpu BloomModel params.

The fused query_key_value weight is stored head-interleaved in HF
([H, 3, hd, D] when reshaped); our Dense expects [D, 3*D] with the same
(h, {q,k,v}, hd) output ordering, so the conversion is a plain transpose.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from sdumc_tpu.models.bloom import BloomConfig


def _a(v):
    return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v,
                      np.float32)


def config_from_hf(hf_config) -> BloomConfig:
    return BloomConfig(
        vocab_size=hf_config.vocab_size,
        hidden_size=hf_config.hidden_size,
        num_layers=hf_config.n_layer,
        num_heads=hf_config.n_head,
        layer_norm_eps=hf_config.layer_norm_epsilon,
    )


def hf_bloom_to_params(state_dict: Dict) -> dict:
    sd = {}
    for k, v in state_dict.items():
        sd[k[len("transformer."):] if k.startswith("transformer.") else k] = _a(v)

    def ln(prefix):
        return {"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]}

    def dense(prefix):
        return {"kernel": sd[prefix + ".weight"].T, "bias": sd[prefix + ".bias"]}

    p = {
        "word_embeddings": {"embedding": sd["word_embeddings.weight"]},
        "word_embeddings_layernorm": ln("word_embeddings_layernorm"),
        "ln_f": ln("ln_f"),
    }
    n_layers = 1 + max(int(k.split(".")[1]) for k in sd if k.startswith("h."))
    for i in range(n_layers):
        pre = f"h.{i}."
        p[f"h_{i}"] = {
            "input_layernorm": ln(pre + "input_layernorm"),
            "post_attention_layernorm": ln(pre + "post_attention_layernorm"),
            "self_attention": {
                "query_key_value": dense(pre + "self_attention.query_key_value"),
                "dense": dense(pre + "self_attention.dense"),
            },
            "dense_h_to_4h": dense(pre + "mlp.dense_h_to_4h"),
            "dense_4h_to_h": dense(pre + "mlp.dense_4h_to_h"),
        }
    return p


def load_hf_bloom(model_dir: str):
    import transformers

    hf = transformers.BloomModel.from_pretrained(model_dir)
    return config_from_hf(hf.config), hf_bloom_to_params(hf.state_dict())
