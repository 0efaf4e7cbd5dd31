"""Generate the EVA-02 numeric-parity fixture (tests/goldens/eva02_tiny.npz).

Independent oracle: a straight-line eager PyTorch rendering of the published
timm EVA-02 architecture (timm eva.py / arXiv:2303.11331 — qkv_fused=False,
swiglu_mlp=True, scale_mlp=True, rope=2D axial, k-proj without bias, CLS
excluded from rotation, num_classes=0 avg-pool head), written directly from
the published recipe rather than from sdumc_tpu/models/eva02.py. The script
emits a timm-SCHEMA state dict plus input/output tensors; test_eva02.py
feeds the state dict through convert/timm_eva02.py into the JAX model and
asserts output parity — covering the converter's key mapping/transposes AND
the model's numerics in one oracle (VERDICT r2 item 6; reference consumer:
extract_vision_huggingface.py:134-146).

Run once to (re)generate:  python tests/goldens/make_eva02_golden.py
"""

import math
import os

import numpy as np
import torch

HERE = os.path.dirname(os.path.abspath(__file__))

# tiny-but-inference-compatible config: head_dim 64 (so the converter's
# head-count inference D//64 recovers num_heads), 4x4 patch grid
D, LAYERS, HEADS, MLP_H = 128, 2, 2, 64
IMG, PATCH = 28, 7
GRID = IMG // PATCH
EPS = 1e-6


def rope_tables(grid: int, head_dim: int, temperature: float = 10000.0):
    """timm build_rotary_pos_embed(in_pixels=False): per axis hd/4 bands,
    axis-major flatten, each angle duplicated onto its interleaved pair."""
    nb = head_dim // 4
    bands = 1.0 / temperature ** (torch.arange(nb, dtype=torch.float64) / nb)
    coords = torch.arange(grid, dtype=torch.float64)
    yy, xx = torch.meshgrid(coords, coords, indexing="ij")
    mesh = torch.stack([yy, xx], dim=-1)                 # [g, g, 2]
    ang = mesh[..., None] * bands                        # [g, g, 2, nb]
    flat = ang.reshape(-1, 2 * nb)                       # [N, hd/2]
    sin = torch.repeat_interleave(torch.sin(flat), 2, dim=-1).float()
    cos = torch.repeat_interleave(torch.cos(flat), 2, dim=-1).float()
    return sin, cos                                      # [N, hd] each


def apply_rot(x: torch.Tensor, sin: torch.Tensor, cos: torch.Tensor):
    """Rotate interleaved pairs: x [..., N, hd]."""
    x2 = x.reshape(*x.shape[:-1], -1, 2)
    rot = torch.stack([-x2[..., 1], x2[..., 0]], dim=-1).reshape(x.shape)
    return x * cos + rot * sin


def forward(sd: dict, px: torch.Tensor):
    """px: [B, 3, H, W] -> (last_hidden_state [B, 1+P, D], pooled [B, D])."""
    B = px.shape[0]
    patches = torch.nn.functional.conv2d(
        px, sd["patch_embed.proj.weight"], sd["patch_embed.proj.bias"],
        stride=PATCH)                                    # [B, D, g, g]
    # timm flattens NCHW row-major: token order (y, x)
    x = patches.flatten(2).transpose(1, 2)               # [B, P, D]
    x = torch.cat([sd["cls_token"].expand(B, -1, -1), x], dim=1)
    x = x + sd["pos_embed"]

    hd = D // HEADS
    sin, cos = rope_tables(GRID, hd)
    for i in range(LAYERS):
        p = f"blocks.{i}."
        h = torch.nn.functional.layer_norm(
            x, (D,), sd[p + "norm1.weight"], sd[p + "norm1.bias"], EPS)
        q = (h @ sd[p + "attn.q_proj.weight"].T + sd[p + "attn.q_proj.bias"])
        k = h @ sd[p + "attn.k_proj.weight"].T           # no k bias
        v = (h @ sd[p + "attn.v_proj.weight"].T + sd[p + "attn.v_proj.bias"])
        N = q.shape[1]
        q = q.view(B, N, HEADS, hd).transpose(1, 2)      # [B, H, N, hd]
        k = k.view(B, N, HEADS, hd).transpose(1, 2)
        v = v.view(B, N, HEADS, hd).transpose(1, 2)
        q = torch.cat([q[:, :, :1], apply_rot(q[:, :, 1:], sin, cos)], dim=2)
        k = torch.cat([k[:, :, :1], apply_rot(k[:, :, 1:], sin, cos)], dim=2)
        att = torch.softmax(q @ k.transpose(-2, -1) / math.sqrt(hd), dim=-1)
        o = (att @ v).transpose(1, 2).reshape(B, N, D)
        x = x + o @ sd[p + "attn.proj.weight"].T + sd[p + "attn.proj.bias"]

        h = torch.nn.functional.layer_norm(
            x, (D,), sd[p + "norm2.weight"], sd[p + "norm2.bias"], EPS)
        g = h @ sd[p + "mlp.fc1_g.weight"].T + sd[p + "mlp.fc1_g.bias"]
        u = h @ sd[p + "mlp.fc1_x.weight"].T + sd[p + "mlp.fc1_x.bias"]
        h = torch.nn.functional.silu(g) * u
        h = torch.nn.functional.layer_norm(
            h, (MLP_H,), sd[p + "mlp.norm.weight"], sd[p + "mlp.norm.bias"],
            EPS)
        x = x + h @ sd[p + "mlp.fc2.weight"].T + sd[p + "mlp.fc2.bias"]

    pooled = torch.nn.functional.layer_norm(
        x[:, 1:].mean(dim=1), (D,), sd["fc_norm.weight"], sd["fc_norm.bias"],
        EPS)
    return x, pooled


def main():
    g = torch.Generator().manual_seed(0)

    def t(*shape, scale=0.05):
        return torch.randn(*shape, generator=g) * scale

    sd = {
        "cls_token": t(1, 1, D),
        "pos_embed": t(1, GRID * GRID + 1, D),
        "patch_embed.proj.weight": t(D, 3, PATCH, PATCH),
        "patch_embed.proj.bias": t(D),
        "fc_norm.weight": 1.0 + t(D),
        "fc_norm.bias": t(D),
    }
    for i in range(LAYERS):
        p = f"blocks.{i}."
        sd.update({
            p + "norm1.weight": 1.0 + t(D), p + "norm1.bias": t(D),
            p + "norm2.weight": 1.0 + t(D), p + "norm2.bias": t(D),
            p + "attn.q_proj.weight": t(D, D), p + "attn.q_proj.bias": t(D),
            p + "attn.k_proj.weight": t(D, D),
            p + "attn.v_proj.weight": t(D, D), p + "attn.v_proj.bias": t(D),
            p + "attn.proj.weight": t(D, D), p + "attn.proj.bias": t(D),
            p + "mlp.fc1_g.weight": t(MLP_H, D), p + "mlp.fc1_g.bias": t(MLP_H),
            p + "mlp.fc1_x.weight": t(MLP_H, D), p + "mlp.fc1_x.bias": t(MLP_H),
            p + "mlp.norm.weight": 1.0 + t(MLP_H), p + "mlp.norm.bias": t(MLP_H),
            p + "mlp.fc2.weight": t(D, MLP_H), p + "mlp.fc2.bias": t(D),
        })

    px = torch.randn(2, 3, IMG, IMG, generator=g)
    with torch.no_grad():
        hidden, pooled = forward(sd, px)

    out = {f"sd/{k}": v.numpy() for k, v in sd.items()}
    out["pixels"] = px.numpy()                      # NCHW
    out["last_hidden_state"] = hidden.numpy()
    out["pooled"] = pooled.numpy()
    path = os.path.join(HERE, "eva02_tiny.npz")
    np.savez_compressed(path, **out)
    print(f"wrote {path}: pooled[0,:4]={pooled[0, :4].tolist()}")


if __name__ == "__main__":
    main()
