"""timm EVA-02 checkpoint -> sdumc_tpu Eva02Model params.

Keyed to the published timm ``eva02_base_patch14_224`` state-dict schema
(qkv_fused=False, swiglu_mlp=True, scale_mlp=True):

  cls_token, pos_embed, patch_embed.proj.{weight,bias},
  blocks.{i}.norm1.{weight,bias}
  blocks.{i}.attn.q_proj.{weight,bias} / k_proj.weight (no bias) /
               v_proj.{weight,bias} / proj.{weight,bias}
  blocks.{i}.norm2.{weight,bias}
  blocks.{i}.mlp.fc1_g.{weight,bias} / fc1_x.{weight,bias} /
               norm.{weight,bias} / fc2.{weight,bias}
  fc_norm.{weight,bias}   (avg-pool head; MIM exports that carry a final
                           ``norm.*`` instead are remapped onto fc_norm)

Loaded raw (safetensors / torch .bin) — timm itself is not required, which
is exactly the dependency the reference pins (timm==0.9.7,
extract_vision_huggingface.py:12).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from sdumc_tpu.models.eva02 import Eva02Config


def _a(v):
    return np.asarray(v.detach().cpu().float().numpy()
                      if hasattr(v, "detach") else v, np.float32)


def config_from_state_dict(sd: Dict) -> Eva02Config:
    """Infer the architecture from tensor shapes (the timm artifact ships
    no config.json with architecture fields we can rely on offline)."""
    patch_w = _a(sd["patch_embed.proj.weight"])      # [D, 3, p, p]
    D, _, p, _ = patch_w.shape
    n_layers = 1 + max(int(k.split(".")[1]) for k in sd if k.startswith("blocks."))
    n_pos = _a(sd["pos_embed"]).shape[1] - 1
    grid = int(round(n_pos ** 0.5))
    mlp_hidden = _a(sd["blocks.0.mlp.fc1_g.weight"]).shape[0]
    # head count is not recoverable from shapes; the published base uses
    # head_dim 64 across the family
    num_heads = max(D // 64, 1)
    return Eva02Config(hidden_size=D, num_layers=n_layers,
                       num_heads=num_heads, mlp_hidden=mlp_hidden,
                       image_size=grid * p, patch_size=p,
                       ref_grid=(grid, grid))


def eva02_to_params(state_dict: Dict, cfg: Eva02Config) -> dict:
    sd = {k: _a(v) for k, v in state_dict.items()}
    if "fc_norm.weight" not in sd and "norm.weight" in sd:
        sd["fc_norm.weight"] = sd.pop("norm.weight")
        sd["fc_norm.bias"] = sd.pop("norm.bias")

    def dense(prefix, bias=True):
        d = {"kernel": sd[prefix + ".weight"].T}
        if bias:
            d["bias"] = sd[prefix + ".bias"]
        return d

    def ln(prefix):
        return {"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]}

    p = {
        "cls_token": sd["cls_token"],
        "pos_embed": sd["pos_embed"],
        # torch conv weight [D, 3, p, p] -> flax [p, p, 3, D]
        "patch_embed": {
            "kernel": np.transpose(sd["patch_embed.proj.weight"], (2, 3, 1, 0)),
            "bias": sd["patch_embed.proj.bias"],
        },
        "fc_norm": ln("fc_norm"),
    }
    for i in range(cfg.num_layers):
        pre = f"blocks.{i}."
        p[f"blocks_{i}"] = {
            "norm1": ln(pre + "norm1"),
            "norm2": ln(pre + "norm2"),
            "q_proj": dense(pre + "attn.q_proj"),
            "k_proj": dense(pre + "attn.k_proj", bias=False),
            "v_proj": dense(pre + "attn.v_proj"),
            "proj": dense(pre + "attn.proj"),
            "fc1_g": dense(pre + "mlp.fc1_g"),
            "fc1_x": dense(pre + "mlp.fc1_x"),
            "mlp_norm": ln(pre + "mlp.norm"),
            "fc2": dense(pre + "mlp.fc2"),
        }
    return p


def load_timm_eva02(model_dir: str) -> Tuple[Eva02Config, dict]:
    """Read the raw checkpoint tensors from a local timm snapshot dir."""
    from sdumc_tpu.convert.hf_glm import _load_raw_state_dict

    sd = {k: _a(v) for k, v in _load_raw_state_dict(model_dir).items()}
    # MIM exports may prefix with 'model.' or carry decoder heads; keep the
    # encoder trunk only
    sd = {k[len("model."):] if k.startswith("model.") else k: v
          for k, v in sd.items()}
    cfg = config_from_state_dict(sd)
    return cfg, eva02_to_params(sd, cfg)
