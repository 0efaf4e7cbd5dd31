"""HF GlmModel / THUDM chatglm2 state dict -> sdumc_tpu GlmModel params.

Two source layouts map onto the same JAX module tree:

* HF-native ``GlmModel`` (transformers >= 4.46, the glm/glm-4 lineage):
  separate q/k/v projections, fused ``gate_up_proj`` — names match ours
  one-to-one.
* Original THUDM chatglm2 (trust_remote_code modeling, the reference's
  'chatglm2-6b' entry, toolkit/globals.py): fused
  ``self_attention.query_key_value`` splits [Hq*hd | KV*hd | KV*hd] in
  order, ``mlp.dense_h_to_4h`` is the fused gate|up, ``dense`` is the
  output projection — a pure renaming + split, no head reordering.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from sdumc_tpu.models.glm import GlmConfig


def _a(v):
    return np.asarray(
        v.detach().cpu().float().numpy() if hasattr(v, "detach") else v,
        np.float32)


def config_from_hf(hf_config) -> GlmConfig:
    import jax.numpy as jnp

    return GlmConfig(
        vocab_size=hf_config.vocab_size,
        hidden_size=hf_config.hidden_size,
        intermediate_size=hf_config.intermediate_size,
        num_layers=hf_config.num_hidden_layers,
        num_heads=hf_config.num_attention_heads,
        num_kv_heads=hf_config.num_key_value_heads,
        head_dim=getattr(hf_config, "head_dim", None)
        or hf_config.hidden_size // hf_config.num_attention_heads,
        partial_rotary_factor=getattr(hf_config, "partial_rotary_factor", 0.5),
        rope_theta=getattr(hf_config, "rope_theta", 10000.0),
        rms_eps=hf_config.rms_norm_eps,
        attention_bias=getattr(hf_config, "attention_bias", True),
        dtype=jnp.float32,
    )


def _is_chatglm(sd: Dict) -> bool:
    return any(k.startswith("transformer.encoder.layers.") for k in sd)


def _chatglm_to_hf_names(sd: Dict, cfg: GlmConfig) -> Dict:
    """Rename + split a THUDM chatglm2 state dict into HF-native layout."""
    out = {}
    q_sz = cfg.num_heads * cfg.head_dim
    kv_sz = cfg.num_kv_heads * cfg.head_dim
    for k, v in sd.items():
        v = _a(v)
        if k == "transformer.embedding.word_embeddings.weight":
            out["embed_tokens.weight"] = v
        elif k == "transformer.encoder.final_layernorm.weight":
            out["norm.weight"] = v
        elif k.startswith("transformer.encoder.layers."):
            rest = k[len("transformer.encoder.layers."):]
            i, sub = rest.split(".", 1)
            pre = f"layers.{i}."
            if sub.startswith("self_attention.query_key_value"):
                kind = sub.rsplit(".", 1)[1]          # weight | bias
                q, kk, vv = np.split(v, [q_sz, q_sz + kv_sz], axis=0)
                out[pre + f"self_attn.q_proj.{kind}"] = q
                out[pre + f"self_attn.k_proj.{kind}"] = kk
                out[pre + f"self_attn.v_proj.{kind}"] = vv
            elif sub == "self_attention.dense.weight":
                out[pre + "self_attn.o_proj.weight"] = v
            elif sub == "mlp.dense_h_to_4h.weight":
                out[pre + "mlp.gate_up_proj.weight"] = v
            elif sub == "mlp.dense_4h_to_h.weight":
                out[pre + "mlp.down_proj.weight"] = v
            elif sub in ("input_layernorm.weight",
                         "post_attention_layernorm.weight"):
                out[pre + sub] = v
        # transformer.output_layer / rotary_pos_emb buffers: lm-head and
        # position buffers, not part of the trunk
    return out


def hf_glm_to_params(state_dict: Dict, cfg: GlmConfig) -> dict:
    if _is_chatglm(state_dict):
        sd = _chatglm_to_hf_names(state_dict, cfg)
    else:
        sd = {k[len("model."):] if k.startswith("model.") else k: _a(v)
              for k, v in state_dict.items()}

    def dense(prefix):
        d = {"kernel": sd[prefix + ".weight"].T}
        if prefix + ".bias" in sd:
            d["bias"] = sd[prefix + ".bias"]
        return d

    p = {
        "embed_tokens": {"embedding": sd["embed_tokens.weight"]},
        "norm": {"scale": sd["norm.weight"]},
    }
    n_layers = 1 + max(int(k.split(".")[1]) for k in sd if k.startswith("layers."))
    for i in range(n_layers):
        pre = f"layers.{i}."
        p[f"layers_{i}"] = {
            "input_layernorm": {"scale": sd[pre + "input_layernorm.weight"]},
            "post_attention_layernorm": {
                "scale": sd[pre + "post_attention_layernorm.weight"]},
            "self_attn": {
                "q_proj": dense(pre + "self_attn.q_proj"),
                "k_proj": dense(pre + "self_attn.k_proj"),
                "v_proj": dense(pre + "self_attn.v_proj"),
                "o_proj": dense(pre + "self_attn.o_proj"),
            },
            "mlp": {
                "gate_up_proj": dense(pre + "mlp.gate_up_proj"),
                "down_proj": dense(pre + "mlp.down_proj"),
            },
        }
    return p


def config_from_chatglm(raw: Dict) -> GlmConfig:
    """GlmConfig from a THUDM chatglm2 config.json dict (model_type
    'chatglm'; its modeling code is trust_remote_code-only, so the fields
    are mapped here rather than through a transformers config class)."""
    import jax.numpy as jnp

    n_heads = raw["num_attention_heads"]
    head_dim = raw.get("kv_channels") or raw["hidden_size"] // n_heads
    return GlmConfig(
        vocab_size=raw.get("padded_vocab_size") or raw["vocab_size"],
        hidden_size=raw["hidden_size"],
        intermediate_size=raw["ffn_hidden_size"],
        num_layers=raw["num_layers"],
        num_heads=n_heads,
        num_kv_heads=(raw["multi_query_group_num"]
                      if raw.get("multi_query_attention") else n_heads),
        head_dim=head_dim,
        partial_rotary_factor=0.5,
        rope_theta=10000.0 * raw.get("rope_ratio", 1.0),
        rms_eps=raw.get("layernorm_epsilon", 1e-5),
        attention_bias=raw.get("add_qkv_bias", True),
        dtype=jnp.float32,
    )


def _load_raw_state_dict(model_dir: str) -> Dict:
    """Read a checkpoint's tensors without instantiating its modeling code
    (sharded or single-file, safetensors or torch .bin)."""
    import glob
    import json
    import os

    sd: Dict = {}
    st_files = sorted(glob.glob(os.path.join(model_dir, "*.safetensors")))
    if st_files:
        from safetensors import safe_open

        for path in st_files:
            with safe_open(path, framework="np") as f:
                for k in f.keys():
                    sd[k] = f.get_tensor(k)
        return sd
    import torch

    index = os.path.join(model_dir, "pytorch_model.bin.index.json")
    if os.path.exists(index):
        with open(index) as f:
            shards = sorted(set(json.load(f)["weight_map"].values()))
        files = [os.path.join(model_dir, s) for s in shards]
    else:
        files = [os.path.join(model_dir, "pytorch_model.bin")]
    for path in files:
        sd.update(torch.load(path, map_location="cpu", weights_only=True))
    return sd


def load_hf_glm(model_dir: str) -> Tuple[GlmConfig, dict]:
    """Load either lineage: HF-native GlmModel checkpoints go through
    transformers; THUDM chatglm2 checkpoints (model_type 'chatglm', whose
    modeling code needs trust_remote_code) are detected from config.json and
    loaded as a raw state dict through the rename/split path above."""
    import json
    import os

    cfg_path = os.path.join(model_dir, "config.json")
    if os.path.isdir(model_dir) and os.path.exists(cfg_path):
        with open(cfg_path) as f:
            raw = json.load(f)
        if raw.get("model_type") == "chatglm":
            cfg = config_from_chatglm(raw)
            return cfg, hf_glm_to_params(_load_raw_state_dict(model_dir), cfg)
    import transformers

    hf = transformers.GlmModel.from_pretrained(model_dir)
    cfg = config_from_hf(hf.config)
    return cfg, hf_glm_to_params(hf.state_dict(), cfg)
