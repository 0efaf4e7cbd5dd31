"""HF DebertaModel (v1) -> sdumc_tpu DebertaModel params.

in_proj weight [3D, D] is head-interleaved ([H, 3, hd, D] reshaped) in HF's
transpose_for_scores convention — our Dense expects [D, 3D] with the same
(h, {q,k,v}, hd) output ordering, so conversion is a plain transpose.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from sdumc_tpu.models.deberta import DebertaConfig


def _a(v):
    return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v,
                      np.float32)


def config_from_hf(hf_config) -> DebertaConfig:
    max_rel = getattr(hf_config, "max_relative_positions", -1)
    if max_rel < 1:
        max_rel = hf_config.max_position_embeddings
    return DebertaConfig(
        vocab_size=hf_config.vocab_size,
        hidden_size=hf_config.hidden_size,
        num_layers=hf_config.num_hidden_layers,
        num_heads=hf_config.num_attention_heads,
        intermediate_size=hf_config.intermediate_size,
        max_position_embeddings=hf_config.max_position_embeddings,
        max_relative_positions=max_rel,
        type_vocab_size=hf_config.type_vocab_size,
        position_biased_input=getattr(hf_config, "position_biased_input", True),
        pos_att_type=tuple(getattr(hf_config, "pos_att_type", None) or ()),
        layer_norm_eps=hf_config.layer_norm_eps,
    )


def hf_deberta_to_params(state_dict: Dict) -> dict:
    sd = {k: _a(v) for k, v in state_dict.items() if not k.startswith("pooler")}

    def ln(prefix):
        return {"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]}

    def dense(prefix, bias=True):
        d = {"kernel": sd[prefix + ".weight"].T}
        if bias:
            d["bias"] = sd[prefix + ".bias"]
        return d

    p = {
        "word_embeddings": {"embedding": sd["embeddings.word_embeddings.weight"]},
        "embeddings_ln": ln("embeddings.LayerNorm"),
        "rel_embeddings": sd["encoder.rel_embeddings.weight"],
    }
    if "embeddings.position_embeddings.weight" in sd:
        p["position_embeddings"] = {
            "embedding": sd["embeddings.position_embeddings.weight"]}
    if "embeddings.token_type_embeddings.weight" in sd:
        p["token_type_embeddings"] = {
            "embedding": sd["embeddings.token_type_embeddings.weight"]}

    n_layers = 1 + max(
        int(k.split(".")[2]) for k in sd if k.startswith("encoder.layer."))
    for i in range(n_layers):
        pre = f"encoder.layer.{i}."
        attn = {
            "in_proj": dense(pre + "attention.self.in_proj", bias=False),
            "q_bias": sd[pre + "attention.self.q_bias"],
            "v_bias": sd[pre + "attention.self.v_bias"],
        }
        if pre + "attention.self.pos_proj.weight" in sd:
            attn["pos_proj"] = dense(pre + "attention.self.pos_proj", bias=False)
        if pre + "attention.self.pos_q_proj.weight" in sd:
            attn["pos_q_proj"] = dense(pre + "attention.self.pos_q_proj")
        p[f"layers_{i}"] = {
            "self_attn": attn,
            "attn_output": dense(pre + "attention.output.dense"),
            "attn_ln": ln(pre + "attention.output.LayerNorm"),
            "intermediate": dense(pre + "intermediate.dense"),
            "output": dense(pre + "output.dense"),
            "output_ln": ln(pre + "output.LayerNorm"),
        }
    return p


def load_hf_deberta(model_dir: str):
    import transformers

    hf = transformers.DebertaModel.from_pretrained(model_dir)
    return config_from_hf(hf.config), hf_deberta_to_params(hf.state_dict())
