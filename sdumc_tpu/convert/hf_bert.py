"""HF BertModel / RobertaModel -> sdumc_tpu BertModel params.

Key layout (both families share it module-for-module):
  embeddings.{word,position,token_type}_embeddings.weight, embeddings.LayerNorm
  encoder.layer.{i}.attention.self.{query,key,value}
  encoder.layer.{i}.attention.output.{dense,LayerNorm}
  encoder.layer.{i}.{intermediate,output}.{dense,LayerNorm}
RoBERTa additionally offsets position ids by pad_token_id+1=2
(config.position_offset). The pooler is dropped — the extractor consumes
hidden_states only (extract_text_embedding_huggingface.py:255).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from sdumc_tpu.models.bert import BertConfig


def _a(v):
    return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v,
                      np.float32)


def config_from_hf(hf_config) -> BertConfig:
    is_roberta = hf_config.model_type in ("roberta", "xlm-roberta", "camembert")
    return BertConfig(
        vocab_size=hf_config.vocab_size,
        hidden_size=hf_config.hidden_size,
        num_layers=hf_config.num_hidden_layers,
        num_heads=hf_config.num_attention_heads,
        intermediate_size=hf_config.intermediate_size,
        max_position_embeddings=hf_config.max_position_embeddings,
        type_vocab_size=hf_config.type_vocab_size,
        layer_norm_eps=hf_config.layer_norm_eps,
        position_offset=(hf_config.pad_token_id or 1) + 1 if is_roberta else 0,
    )


def hf_bert_to_params(state_dict: Dict) -> dict:
    sd = {k: _a(v) for k, v in state_dict.items()
          if not k.startswith("pooler.")}

    def ln(prefix):
        return {"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]}

    def dense(prefix):
        return {"kernel": sd[prefix + ".weight"].T, "bias": sd[prefix + ".bias"]}

    p = {
        "word_embeddings": {"embedding": sd["embeddings.word_embeddings.weight"]},
        "position_embeddings": {
            "embedding": sd["embeddings.position_embeddings.weight"]},
        "token_type_embeddings": {
            "embedding": sd["embeddings.token_type_embeddings.weight"]},
        "embeddings_ln": ln("embeddings.LayerNorm"),
    }
    n_layers = 1 + max(
        int(k.split(".")[2]) for k in sd if k.startswith("encoder.layer."))
    for i in range(n_layers):
        pre = f"encoder.layer.{i}."
        p[f"layers_{i}"] = {
            "self_attn": {
                "query": dense(pre + "attention.self.query"),
                "key": dense(pre + "attention.self.key"),
                "value": dense(pre + "attention.self.value"),
            },
            "attn_output": dense(pre + "attention.output.dense"),
            "attn_ln": ln(pre + "attention.output.LayerNorm"),
            "intermediate": dense(pre + "intermediate.dense"),
            "output": dense(pre + "output.dense"),
            "output_ln": ln(pre + "output.LayerNorm"),
        }
    return p


def load_hf_bert(model_dir: str):
    """Local HF checkpoint dir -> (BertConfig, params)."""
    import transformers

    hf = transformers.AutoModel.from_pretrained(model_dir, add_pooling_layer=False)
    cfg = config_from_hf(hf.config)
    return cfg, hf_bert_to_params(hf.state_dict())
