"""HF AlbertModel -> sdumc_tpu AlbertModel params (single shared layer
group; the reference drives albert-base/large/xxlarge and the Chinese
tiny/small variants through the same extractor path)."""

from __future__ import annotations

from typing import Dict

import numpy as np

from sdumc_tpu.models.albert import AlbertConfig


def _a(v):
    return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v,
                      np.float32)


def config_from_hf(hf_config) -> AlbertConfig:
    assert hf_config.num_hidden_groups == 1, "multi-group ALBERT unsupported"
    assert hf_config.inner_group_num == 1, "inner groups unsupported"
    return AlbertConfig(
        vocab_size=hf_config.vocab_size,
        embedding_size=hf_config.embedding_size,
        hidden_size=hf_config.hidden_size,
        num_layers=hf_config.num_hidden_layers,
        num_heads=hf_config.num_attention_heads,
        intermediate_size=hf_config.intermediate_size,
        max_position_embeddings=hf_config.max_position_embeddings,
        type_vocab_size=hf_config.type_vocab_size,
        layer_norm_eps=hf_config.layer_norm_eps,
        hidden_act=hf_config.hidden_act,
    )


def hf_albert_to_params(state_dict: Dict) -> dict:
    sd = {k: _a(v) for k, v in state_dict.items() if not k.startswith("pooler")}

    def ln(prefix):
        return {"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]}

    def dense(prefix):
        return {"kernel": sd[prefix + ".weight"].T, "bias": sd[prefix + ".bias"]}

    layer_pre = "encoder.albert_layer_groups.0.albert_layers.0."
    return {
        "word_embeddings": {"embedding": sd["embeddings.word_embeddings.weight"]},
        "position_embeddings": {
            "embedding": sd["embeddings.position_embeddings.weight"]},
        "token_type_embeddings": {
            "embedding": sd["embeddings.token_type_embeddings.weight"]},
        "embeddings_ln": ln("embeddings.LayerNorm"),
        "embedding_projection": dense("encoder.embedding_hidden_mapping_in"),
        "layer": {
            "query": dense(layer_pre + "attention.query"),
            "key": dense(layer_pre + "attention.key"),
            "value": dense(layer_pre + "attention.value"),
            "attn_dense": dense(layer_pre + "attention.dense"),
            "attn_ln": ln(layer_pre + "attention.LayerNorm"),
            "ffn": dense(layer_pre + "ffn"),
            "ffn_output": dense(layer_pre + "ffn_output"),
            "full_layer_ln": ln(layer_pre + "full_layer_layer_norm"),
        },
    }


def load_hf_albert(model_dir: str):
    import transformers

    hf = transformers.AlbertModel.from_pretrained(model_dir, add_pooling_layer=False)
    return config_from_hf(hf.config), hf_albert_to_params(hf.state_dict())
