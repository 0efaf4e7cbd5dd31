"""Baseline fusion families: TFN and LMF.

The reference's MODEL_MAP names tfn/lmf/mfn/misa/... but their code is
STRIPPED from the public snapshot (toolkit/models/__init__.py:7-27 imports
files that do not exist; only the hyperparameter grids survive,
model-tune.yaml:1-12). These are clean-room implementations of the two
classic families from their papers (Zadeh et al. 2017 TFN; Liu et al. 2018
LMF), registered on the same MODELS registry and speaking the same
dual-view interface as SDUMCFusion — so the existing train/eval loop,
losses, and missing-modality substitution drive them unchanged.

Hyperparameters follow the reference's tuner grid ranges
(hidden_dim/rank/dropout, model-tune.yaml).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from sdumc_tpu.core.config import ModelConfig
from sdumc_tpu.core.registry import MODELS


def masked_mean(x: jnp.ndarray, t_max) -> jnp.ndarray:
    """[B, T, D] -> [B, D] mean over the first t_max frames (pads are
    zero-filled by the collate, so sum/t_max is exact)."""
    if t_max is None:
        return jnp.mean(x, axis=1)
    T = x.shape[1]
    mask = (jnp.arange(T) < t_max)[None, :, None]
    return jnp.sum(x * mask, axis=1) / jnp.maximum(t_max, 1)


class ModalityEncoder(nn.Module):
    """Pool -> 2-layer ReLU MLP (the TFN/LMF per-modality subnetwork)."""

    hidden: int
    dropout: float

    @nn.compact
    def __call__(self, x, t_max=None, deterministic=True):
        h = masked_mean(x, t_max)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.relu(nn.Dense(self.hidden, name="fc1")(h))
        h = nn.relu(nn.Dense(self.hidden, name="fc2")(h))
        return h


class _BaselineBase(nn.Module):
    """Shared aux plumbing so the dual-view distillation loss applies."""

    cfg: ModelConfig

    def _aux(self, fused_hidden, text_hidden, deterministic):
        rnc = nn.Dense(64, name="rnc_proj")(fused_hidden)
        return {
            "features": fused_hidden,
            "rnc": rnc,
            "text_feat": text_hidden,
            "text_query_feat": text_hidden,
            "attn": None,
        }


@MODELS.register("tfn")
class TFN(_BaselineBase):
    """Tensor Fusion Network: outer product of the three [1; z_m] vectors,
    flattened into a post-fusion MLP."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, audio, text, video, *, t_max: Optional[Tuple] = None,
                 missing: bool = False, deterministic: bool = True):
        cfg = self.cfg
        h = cfg.baseline_hidden_dim
        tm = t_max or (None, None, None)
        za = ModalityEncoder(h, cfg.dropout, name="audio_enc")(
            audio, tm[0], deterministic)
        zt = ModalityEncoder(h, cfg.dropout, name="text_enc")(
            text, tm[1], deterministic)
        zv = ModalityEncoder(h, cfg.dropout, name="video_enc")(
            video, tm[2], deterministic)

        one = jnp.ones((audio.shape[0], 1), za.dtype)
        za1 = jnp.concatenate([one, za], axis=-1)
        zt1 = jnp.concatenate([one, zt], axis=-1)
        zv1 = jnp.concatenate([one, zv], axis=-1)
        fused = jnp.einsum("bi,bj,bk->bijk", za1, zt1, zv1)
        fused = fused.reshape(audio.shape[0], -1)

        f = nn.Dropout(cfg.dropout, deterministic=deterministic)(fused)
        f = nn.relu(nn.Dense(h, name="post_fc1")(f))
        f = nn.relu(nn.Dense(h, name="post_fc2")(f))
        vals = nn.Dense(cfg.output_dim, name="out")(f)
        return vals, self._aux(f, zt, deterministic)


@MODELS.register("lmf")
class LMF(_BaselineBase):
    """Low-rank Multimodal Fusion: per-modality rank factors, elementwise
    product across modalities, summed over rank."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, audio, text, video, *, t_max: Optional[Tuple] = None,
                 missing: bool = False, deterministic: bool = True):
        cfg = self.cfg
        h = cfg.baseline_hidden_dim
        r = cfg.baseline_rank
        tm = t_max or (None, None, None)
        zs = []
        for name, x, t in (("audio_enc", audio, tm[0]),
                           ("text_enc", text, tm[1]),
                           ("video_enc", video, tm[2])):
            z = ModalityEncoder(h, cfg.dropout, name=name)(x, t, deterministic)
            zs.append(jnp.concatenate(
                [jnp.ones((x.shape[0], 1), z.dtype), z], axis=-1))

        fused = None
        for i, z in enumerate(zs):
            factor = self.param(
                f"factor_{i}", nn.initializers.xavier_uniform(),
                (r, h + 1, h))
            proj = jnp.einsum("bj,rjk->brk", z, factor)
            fused = proj if fused is None else fused * proj
        fusion_w = self.param("fusion_weights",
                              nn.initializers.xavier_uniform(), (1, r))
        fusion_b = self.param("fusion_bias", nn.initializers.zeros, (h,))
        f = jnp.einsum("or,brk->bk", fusion_w, fused) + fusion_b

        vals = nn.Dense(cfg.output_dim, name="out")(f)
        return vals, self._aux(f, zs[1][:, 1:], deterministic)
