"""HuggingFace WavLM checkpoint -> Flax params.

Folds the positional-conv weight norm (g * v / ||v||, torch weight_norm
dim=2) into an effective kernel — extraction runs the encoder frozen
(the reference also freezes it, extract_transformers_embedding.py:63).

torch Conv1d weight [out, in/groups, k] -> flax conv kernel [k, in/groups, out].
"""

from __future__ import annotations

import re
from typing import Dict

import numpy as np

from sdumc_tpu.models.wavlm import WavLMConfig


def config_from_hf(hf_config) -> WavLMConfig:
    is_wavlm = hasattr(hf_config, "num_buckets")
    return WavLMConfig(
        hidden_size=hf_config.hidden_size,
        num_layers=hf_config.num_hidden_layers,
        num_heads=hf_config.num_attention_heads,
        intermediate_size=hf_config.intermediate_size,
        conv_dim=tuple(hf_config.conv_dim),
        conv_kernel=tuple(hf_config.conv_kernel),
        conv_stride=tuple(hf_config.conv_stride),
        conv_bias=hf_config.conv_bias,
        feat_extract_norm=hf_config.feat_extract_norm,
        do_stable_layer_norm=hf_config.do_stable_layer_norm,
        num_conv_pos_embeddings=hf_config.num_conv_pos_embeddings,
        num_conv_pos_embedding_groups=hf_config.num_conv_pos_embedding_groups,
        num_buckets=getattr(hf_config, "num_buckets", 320),
        max_bucket_distance=getattr(hf_config, "max_bucket_distance", 800),
        layer_norm_eps=hf_config.layer_norm_eps,
        use_rel_pos_bias=is_wavlm,
    )


def _a(v):
    if hasattr(v, "detach"):
        v = v.detach().to("cpu").float().numpy()
    return np.asarray(v, dtype=np.float32)


def _conv_t2f(w):  # [out, in, k] -> [k, in, out]
    return np.transpose(w, (2, 1, 0))


def hf_wavlm_to_params(state_dict: Dict) -> dict:
    sd = {k: _a(v) for k, v in state_dict.items()}
    p: dict = {
        "feature_extractor": {},
        "feature_ln": {},
        "feature_projection": {},
        "pos_conv_embed": {},
        "encoder_ln": {},
    }

    # --- feature encoder convs (+ per-layer LN or first-layer GN)
    i = 0
    while f"feature_extractor.conv_layers.{i}.conv.weight" in sd:
        p["feature_extractor"][f"conv_{i}_kernel"] = _conv_t2f(
            sd[f"feature_extractor.conv_layers.{i}.conv.weight"]
        )
        b = sd.get(f"feature_extractor.conv_layers.{i}.conv.bias")
        if b is not None:
            p["feature_extractor"][f"conv_{i}_bias"] = b
        lnw = sd.get(f"feature_extractor.conv_layers.{i}.layer_norm.weight")
        if lnw is not None:
            lnb = sd[f"feature_extractor.conv_layers.{i}.layer_norm.bias"]
            name = "gn_0" if (i == 0 and lnw.ndim == 1 and
                              f"feature_extractor.conv_layers.1.layer_norm.weight" not in sd) else f"ln_{i}"
            p["feature_extractor"][name] = {"scale": lnw, "bias": lnb}
        i += 1

    # --- feature projection
    p["feature_ln"] = {
        "scale": sd["feature_projection.layer_norm.weight"],
        "bias": sd["feature_projection.layer_norm.bias"],
    }
    p["feature_projection"] = {
        "kernel": sd["feature_projection.projection.weight"].T,
        "bias": sd["feature_projection.projection.bias"],
    }

    # --- positional conv embedding: fold weight norm
    if "encoder.pos_conv_embed.conv.parametrizations.weight.original0" in sd:
        g = sd["encoder.pos_conv_embed.conv.parametrizations.weight.original0"]
        v = sd["encoder.pos_conv_embed.conv.parametrizations.weight.original1"]
    else:
        g = sd["encoder.pos_conv_embed.conv.weight_g"]
        v = sd["encoder.pos_conv_embed.conv.weight_v"]
    norm = np.sqrt(np.sum(v ** 2, axis=(0, 1), keepdims=True))  # dim=2 norm
    w = g * v / np.maximum(norm, 1e-12)
    p["pos_conv_embed"] = {
        "kernel": _conv_t2f(w),
        "bias": sd["encoder.pos_conv_embed.conv.bias"],
    }

    # --- encoder-level LN (pre-loop for post-LN models, final for stable-LN)
    p["encoder_ln"] = {
        "scale": sd["encoder.layer_norm.weight"],
        "bias": sd["encoder.layer_norm.bias"],
    }

    # --- layers
    lre = re.compile(r"^encoder\.layers\.(\d+)\.(.+)$")
    layers: Dict[int, dict] = {}
    for key, val in sd.items():
        m = lre.match(key)
        if not m:
            continue
        i, sub = int(m.group(1)), m.group(2)
        L = layers.setdefault(i, {})
        if sub == "attention.rel_attn_embed.weight":
            L.setdefault("attention", {})["rel_attn_embed"] = val
        elif sub == "attention.gru_rel_pos_const":
            L.setdefault("attention", {})["gru_rel_pos_const"] = val
        elif sub.startswith("attention.gru_rel_pos_linear."):
            leaf = sub.rsplit(".", 1)[1]
            d = L.setdefault("attention", {}).setdefault("gru_rel_pos_linear", {})
            d["kernel" if leaf == "weight" else "bias"] = (
                val.T if leaf == "weight" else val
            )
        elif sub.startswith("attention."):
            _, proj, leaf = sub.split(".")
            d = L.setdefault("attention", {}).setdefault(proj, {})
            d["kernel" if leaf == "weight" else "bias"] = (
                val.T if leaf == "weight" else val
            )
        elif sub.startswith("layer_norm."):
            leaf = sub.rsplit(".", 1)[1]
            L.setdefault("layer_norm", {})["scale" if leaf == "weight" else "bias"] = val
        elif sub.startswith("final_layer_norm."):
            leaf = sub.rsplit(".", 1)[1]
            L.setdefault("final_layer_norm", {})["scale" if leaf == "weight" else "bias"] = val
        elif sub.startswith("feed_forward.intermediate_dense."):
            leaf = sub.rsplit(".", 1)[1]
            d = L.setdefault("intermediate_dense", {})
            d["kernel" if leaf == "weight" else "bias"] = (
                val.T if leaf == "weight" else val
            )
        elif sub.startswith("feed_forward.output_dense."):
            leaf = sub.rsplit(".", 1)[1]
            d = L.setdefault("output_dense", {})
            d["kernel" if leaf == "weight" else "bias"] = (
                val.T if leaf == "weight" else val
            )
    for i, L in layers.items():
        p[f"layers_{i}"] = L
    return p


def load_hf_wavlm(model_dir: str):
    """Load a WavLM / wav2vec2 / HuBERT checkpoint (the reference's audio
    extractor dispatches on the model name the same way,
    extract_transformers_embedding.py:36-57)."""
    import transformers

    name = model_dir.lower()
    if "wav2vec" in name:
        hf = transformers.Wav2Vec2Model.from_pretrained(model_dir)
    elif "hubert" in name:
        hf = transformers.HubertModel.from_pretrained(model_dir)
    else:
        hf = transformers.WavLMModel.from_pretrained(model_dir)
    return config_from_hf(hf.config), hf_wavlm_to_params(hf.state_dict())
