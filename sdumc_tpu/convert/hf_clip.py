"""HF CLIPVisionModelWithProjection -> sdumc_tpu CLIPVisionTower params.

The reference loads clip-vit-base/large via AutoModel and calls
``get_image_features`` (extract_vision_huggingface.py:134-137,172-179);
this converter maps the torch state dict onto models/clip_vit.py.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from sdumc_tpu.models.clip_vit import CLIPVisionConfig


def config_from_hf(hf_config, projection_dim=None) -> CLIPVisionConfig:
    return CLIPVisionConfig(
        hidden_size=hf_config.hidden_size,
        intermediate_size=hf_config.intermediate_size,
        num_layers=hf_config.num_hidden_layers,
        num_heads=hf_config.num_attention_heads,
        image_size=hf_config.image_size,
        patch_size=hf_config.patch_size,
        projection_dim=projection_dim or getattr(hf_config, "projection_dim", 512),
        layer_norm_eps=hf_config.layer_norm_eps,
        hidden_act=hf_config.hidden_act,
    )


def _a(v):
    return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v,
                      np.float32)


def hf_clip_vision_to_params(state_dict: Dict) -> dict:
    """torch keys (vision_model.*, visual_projection.*) -> flax tree.
    Conv kernel [D,3,p,p] -> [p,p,3,D]; Dense weights transpose;
    HF's 'pre_layrnorm' typo normalized."""
    sd = {k: _a(v) for k, v in state_dict.items()}
    p = {}
    emb = "vision_model.embeddings."
    p["class_embedding"] = sd[emb + "class_embedding"].reshape(-1)
    p["patch_embedding"] = {
        "kernel": sd[emb + "patch_embedding.weight"].transpose(2, 3, 1, 0)
    }
    p["position_embedding"] = sd[emb + "position_embedding.weight"]
    for hf_name, ours in (("pre_layrnorm", "pre_layernorm"),
                          ("pre_layernorm", "pre_layernorm"),
                          ("post_layernorm", "post_layernorm")):
        key = f"vision_model.{hf_name}.weight"
        if key in sd:
            p[ours] = {"scale": sd[key],
                       "bias": sd[f"vision_model.{hf_name}.bias"]}
    n_layers = 1 + max(
        int(k.split(".")[3]) for k in sd if k.startswith("vision_model.encoder.layers.")
    )
    for i in range(n_layers):
        pre = f"vision_model.encoder.layers.{i}."
        layer = {}
        for ln in ("layer_norm1", "layer_norm2"):
            layer[ln] = {"scale": sd[pre + ln + ".weight"],
                         "bias": sd[pre + ln + ".bias"]}
        attn = {}
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            attn[proj] = {"kernel": sd[pre + f"self_attn.{proj}.weight"].T,
                          "bias": sd[pre + f"self_attn.{proj}.bias"]}
        layer["self_attn"] = attn
        for fc in ("fc1", "fc2"):
            layer[fc] = {"kernel": sd[pre + f"mlp.{fc}.weight"].T,
                         "bias": sd[pre + f"mlp.{fc}.bias"]}
        p[f"layers_{i}"] = layer
    p["visual_projection"] = {"kernel": sd["visual_projection.weight"].T}
    return p


def load_hf_clip_vision(model_dir: str):
    """Local HF checkpoint dir -> (CLIPVisionConfig, params)."""
    import transformers

    hf = transformers.CLIPVisionModelWithProjection.from_pretrained(model_dir)
    cfg = config_from_hf(hf.config)
    return cfg, hf_clip_vision_to_params(hf.state_dict())
