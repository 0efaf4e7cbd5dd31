"""HF VideoMAEModel -> sdumc_tpu VideoMAEModel params.

The patch-embed 3D conv converts torch [D, 3, tb, p, p] -> flax DHWIO
[tb, p, p, 3, D]; the sinusoid position table is regenerated (a fixed
buffer in HF, never learned). VideoMAE's k-bias is a frozen zero in HF
(modeling_videomae.py:242) and simply absent here.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from sdumc_tpu.models.videomae import VideoMAEConfig


def _a(v):
    return np.asarray(v.detach().cpu().float().numpy()
                      if hasattr(v, "detach") else v, np.float32)


def config_from_hf(hf_config) -> VideoMAEConfig:
    return VideoMAEConfig(
        hidden_size=hf_config.hidden_size,
        num_layers=hf_config.num_hidden_layers,
        num_heads=hf_config.num_attention_heads,
        intermediate_size=hf_config.intermediate_size,
        image_size=hf_config.image_size,
        patch_size=hf_config.patch_size,
        num_frames=hf_config.num_frames,
        tubelet_size=hf_config.tubelet_size,
        layer_norm_eps=hf_config.layer_norm_eps,
        qkv_bias=hf_config.qkv_bias,
        use_mean_pooling=hf_config.use_mean_pooling,
    )


def hf_videomae_to_params(state_dict: Dict, cfg: VideoMAEConfig) -> dict:
    sd = {k: _a(v) for k, v in state_dict.items()}

    def ln(prefix):
        return {"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]}

    def dense(prefix, bias_key=None):
        d = {"kernel": sd[prefix + ".weight"].T}
        if bias_key is not None:
            d["bias"] = sd[bias_key]
        elif prefix + ".bias" in sd:
            d["bias"] = sd[prefix + ".bias"]
        return d

    p = {
        "patch_kernel": np.transpose(
            sd["embeddings.patch_embeddings.projection.weight"],
            (2, 3, 4, 1, 0)),
        "patch_bias": sd["embeddings.patch_embeddings.projection.bias"],
    }
    if "layernorm.weight" in sd:
        p["layernorm"] = ln("layernorm")
    for i in range(cfg.num_layers):
        pre = f"encoder.layer.{i}."
        p[f"layers_{i}"] = {
            "layernorm_before": ln(pre + "layernorm_before"),
            "layernorm_after": ln(pre + "layernorm_after"),
            "query": dense(pre + "attention.attention.query",
                           bias_key=pre + "attention.attention.q_bias"
                           if cfg.qkv_bias else None),
            "key": dense(pre + "attention.attention.key"),
            "value": dense(pre + "attention.attention.value",
                           bias_key=pre + "attention.attention.v_bias"
                           if cfg.qkv_bias else None),
            "attn_out": dense(pre + "attention.output.dense"),
            "fc1": dense(pre + "intermediate.dense"),
            "fc2": dense(pre + "output.dense"),
        }
    return p


def load_hf_videomae(model_dir: str) -> Tuple[VideoMAEConfig, dict]:
    import transformers

    hf = transformers.VideoMAEModel.from_pretrained(model_dir)
    cfg = config_from_hf(hf.config)
    return cfg, hf_videomae_to_params(hf.state_dict(), cfg)
