"""WavLM -> LLM embedding-space projector (the SDUMC bridge).

Reference ``EncoderProjectorConcat`` (extract_wavlm_vicuna.py:160-184):
stack k=5 adjacent WavLM frames (discarding the remainder), then
Linear(5*1024 -> 2048) -> ReLU -> Linear(2048 -> 4096), loaded frozen from
the released ``WalmL2VicunaV1.5_model.pt`` (:190-196).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


class EncoderProjectorConcat(nn.Module):
    k: int = 5
    encoder_dim: int = 1024
    hidden_dim: int = 2048
    llm_dim: int = 4096

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: [B, T, encoder_dim] -> [B, T//k, llm_dim]."""
        b, t, d = x.shape
        t = (t // self.k) * self.k
        x = x[:, :t].reshape(b, t // self.k, d * self.k)
        x = nn.Dense(self.hidden_dim, name="linear1")(x)
        x = nn.relu(x)
        return nn.Dense(self.llm_dim, name="linear2")(x)


def projector_params_from_torch(state_dict) -> dict:
    """Convert the released projector checkpoint (keys possibly prefixed
    with ``encoder_projector.``, extract_wavlm_vicuna.py:192-193)."""

    def arr(v):
        if hasattr(v, "detach"):
            v = v.detach().to("cpu").float().numpy()
        return np.asarray(v, np.float32)

    out = {}
    for key, val in state_dict.items():
        k = key[len("encoder_projector."):] if key.startswith("encoder_projector.") else key
        name, leaf = k.split(".")
        out.setdefault(name, {})["kernel" if leaf == "weight" else "bias"] = (
            arr(val).T if leaf == "weight" else arr(val)
        )
    return out


def load_projector(path: str):
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    return projector_params_from_torch(blob)
