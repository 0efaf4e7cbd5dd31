"""HF Dinov2Model -> sdumc_tpu Dinov2Model params."""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from sdumc_tpu.models.dinov2 import Dinov2Config


def _a(v):
    return np.asarray(v.detach().cpu().float().numpy()
                      if hasattr(v, "detach") else v, np.float32)


def config_from_hf(hf_config) -> Dinov2Config:
    return Dinov2Config(
        hidden_size=hf_config.hidden_size,
        num_layers=hf_config.num_hidden_layers,
        num_heads=hf_config.num_attention_heads,
        mlp_ratio=hf_config.mlp_ratio,
        image_size=hf_config.image_size,
        patch_size=hf_config.patch_size,
        layer_norm_eps=hf_config.layer_norm_eps,
        use_swiglu_ffn=hf_config.use_swiglu_ffn,
    )


def hf_dinov2_to_params(state_dict: Dict, cfg: Dinov2Config) -> dict:
    sd = {k: _a(v) for k, v in state_dict.items()}

    def dense(prefix):
        return {"kernel": sd[prefix + ".weight"].T,
                "bias": sd[prefix + ".bias"]}

    def ln(prefix):
        return {"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]}

    p = {
        "cls_token": sd["embeddings.cls_token"],
        "position_embeddings": sd["embeddings.position_embeddings"],
        # torch conv weight [D, 3, k, k] -> flax [k, k, 3, D]
        "patch_embed": {
            "kernel": np.transpose(
                sd["embeddings.patch_embeddings.projection.weight"],
                (2, 3, 1, 0)),
            "bias": sd["embeddings.patch_embeddings.projection.bias"],
        },
        "layernorm": ln("layernorm"),
    }
    for i in range(cfg.num_layers):
        pre = f"encoder.layer.{i}."
        layer = {
            "norm1": ln(pre + "norm1"),
            "norm2": ln(pre + "norm2"),
            "query": dense(pre + "attention.attention.query"),
            "key": dense(pre + "attention.attention.key"),
            "value": dense(pre + "attention.attention.value"),
            "attn_out": dense(pre + "attention.output.dense"),
            "layer_scale1": sd[pre + "layer_scale1.lambda1"],
            "layer_scale2": sd[pre + "layer_scale2.lambda1"],
        }
        if cfg.use_swiglu_ffn:
            layer["weights_in"] = dense(pre + "mlp.weights_in")
            layer["weights_out"] = dense(pre + "mlp.weights_out")
        else:
            layer["fc1"] = dense(pre + "mlp.fc1")
            layer["fc2"] = dense(pre + "mlp.fc2")
        p[f"layers_{i}"] = layer
    return p


def load_hf_dinov2(model_dir: str) -> Tuple[Dinov2Config, dict]:
    import transformers

    hf = transformers.Dinov2Model.from_pretrained(model_dir)
    cfg = config_from_hf(hf.config)
    return cfg, hf_dinov2_to_params(hf.state_dict(), cfg)
