"""HuggingFace LLaMA/Vicuna checkpoint -> Flax params.

Loads the torch state_dict of ``LlamaForCausalLM`` (the reference loads
vicuna-7b-v1.5 via AutoModelForCausalLM and halves it,
extract_wavlm_vicuna.py:199-201) into sdumc_tpu.models.llama.
"""

from __future__ import annotations

import re
from typing import Dict

import numpy as np

from sdumc_tpu.models.llama import LlamaConfig


def config_from_hf(hf_config) -> LlamaConfig:
    import jax.numpy as jnp

    return LlamaConfig(
        vocab_size=hf_config.vocab_size,
        hidden_size=hf_config.hidden_size,
        intermediate_size=hf_config.intermediate_size,
        num_layers=hf_config.num_hidden_layers,
        num_heads=hf_config.num_attention_heads,
        num_kv_heads=getattr(hf_config, "num_key_value_heads", None),
        rope_theta=getattr(hf_config, "rope_theta", 10000.0),
        rms_eps=hf_config.rms_norm_eps,
        max_position_embeddings=hf_config.max_position_embeddings,
        dtype=jnp.bfloat16,
    )


def hf_llama_to_params(state_dict: Dict, dtype=np.float32) -> dict:
    """torch (or numpy) LlamaForCausalLM state_dict -> flax param dict."""

    def arr(v):
        if hasattr(v, "detach"):
            v = v.detach().to("cpu").float().numpy()
        return np.asarray(v, dtype=dtype)

    params: dict = {"model": {"layers": {}}}
    model: dict = params["model"]
    layer_re = re.compile(r"^model\.layers\.(\d+)\.(.+)\.weight$")

    for key, value in state_dict.items():
        if key == "model.embed_tokens.weight":
            model["embed_tokens"] = {"embedding": arr(value)}
        elif key == "model.norm.weight":
            model["norm"] = {"scale": arr(value)}
        elif key == "lm_head.weight":
            params["lm_head"] = {"kernel": arr(value).T}
        else:
            m = layer_re.match(key)
            if not m:
                continue
            i, sub = int(m.group(1)), m.group(2)
            layer = model.setdefault(f"layers_{i}", {})
            if sub in ("input_layernorm", "post_attention_layernorm"):
                layer[sub] = {"scale": arr(value)}
            else:
                group, proj = sub.split(".")  # self_attn.q_proj / mlp.up_proj
                layer.setdefault(group, {})[proj] = {"kernel": arr(value).T}

    del params["model"]["layers"]
    return params


def load_hf_llama(model_dir: str):
    """Read an on-disk HF checkpoint -> (LlamaConfig, params)."""
    import transformers

    hf = transformers.AutoModelForCausalLM.from_pretrained(
        model_dir, low_cpu_mem_usage=True
    )
    cfg = config_from_hf(hf.config)
    params = hf_llama_to_params(hf.state_dict())
    return cfg, params


def stack_scan_layers(params: dict) -> dict:
    """Convert an unrolled param tree (``layers_0`` .. ``layers_{L-1}``)
    into the scan layout (one ``layers`` subtree, leading [L] axis on every
    leaf) that LlamaConfig(scan_layers=True) expects. Works on the trunk
    subtree or a full LlamaForCausalLM tree (``model`` wrapper)."""
    import jax

    if "model" in params:
        out = dict(params)
        out["model"] = stack_scan_layers(params["model"])
        return out
    n = 1 + max(int(k.split("_")[1]) for k in params if k.startswith("layers_"))
    stacked = jax.tree_util.tree_map(
        lambda *xs: np.stack([np.asarray(x) for x in xs]),
        *[params[f"layers_{i}"] for i in range(n)])
    out = {k: v for k, v in params.items() if not k.startswith("layers_")}
    out["layers"] = stacked
    return out
