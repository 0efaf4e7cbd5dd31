"""Utterance-level baseline fusion families: TFN, LMF, Attention, MISA, MMIM.

The reference's MODEL_MAP names tfn/lmf/attention/misa/mmim/... but their
code is STRIPPED from the public snapshot (toolkit/models/__init__.py:7-27
imports files that do not exist; only the hyperparameter grids survive,
model-tune.yaml:1-80). These are clean-room implementations from the papers
(Zadeh et al. 2017 TFN; Liu et al. 2018 LMF; Hazarika et al. 2020 MISA;
Han et al. 2021 MMIM), registered on the same MODELS registry and speaking
the same dual-view interface as SDUMCFusion — so the existing train/eval
loop, losses, and missing-modality substitution drive them unchanged.
Families with their own self-supervised objectives return them in
``aux["model_loss"]`` (weights from ModelConfig, ranges per model-tune.yaml);
the dual-view step adds the term when present.

The sequence/aligned families (mfn/graph_mfn/mfm/mctn/mult) live in
``baselines_seq.py``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
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


@MODELS.register("attention")
class AttentionFusion(_BaselineBase):
    """The reference's 'attention' baseline (utterance-level, MMSA lineage):
    per-modality MLP encoders, a softmax attention over the three modality
    vectors, attention-weighted concat into a fusion MLP."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, audio, text, video, *, t_max: Optional[Tuple] = None,
                 missing: bool = False, deterministic: bool = True):
        cfg = self.cfg
        h = cfg.baseline_hidden_dim
        tm = t_max or (None, None, None)
        zs = [
            ModalityEncoder(h, cfg.dropout, name=n)(x, t, deterministic)
            for n, x, t in (("audio_enc", audio, tm[0]),
                            ("text_enc", text, tm[1]),
                            ("video_enc", video, tm[2]))
        ]
        cat = jnp.concatenate(zs, axis=-1)                        # [B, 3h]
        w = nn.Dense(3, name="att_fc")(nn.tanh(
            nn.Dense(h, name="att_hidden")(cat)))                 # [B, 3]
        w = jax.nn.softmax(w, axis=-1)
        fused = jnp.concatenate(
            [z * w[:, i:i + 1] for i, z in enumerate(zs)], axis=-1)
        f = nn.Dropout(cfg.dropout, deterministic=deterministic)(fused)
        f = nn.relu(nn.Dense(h, name="post_fc1")(f))
        vals = nn.Dense(cfg.output_dim, name="out")(f)
        return vals, self._aux(f, zs[1], deterministic)


def _cmd_loss(x, y, n_moments: int = 5) -> jnp.ndarray:
    """Central Moment Discrepancy (Zellinger et al. 2017) between two
    batches — MISA's similarity loss between modality-invariant spaces."""
    mx, my = jnp.mean(x, axis=0), jnp.mean(y, axis=0)
    cx, cy = x - mx, y - my
    loss = jnp.linalg.norm(mx - my)
    for k in range(2, n_moments + 1):
        loss = loss + jnp.linalg.norm(
            jnp.mean(cx ** k, axis=0) - jnp.mean(cy ** k, axis=0))
    return loss


def _diff_loss(a, b) -> jnp.ndarray:
    """Squared Frobenius norm of the correlation between two (batch-centred,
    l2-normalised) representation matrices — MISA's orthogonality loss."""
    a = a - jnp.mean(a, axis=0)
    b = b - jnp.mean(b, axis=0)
    a = a / jnp.maximum(jnp.linalg.norm(a, axis=1, keepdims=True), 1e-6)
    b = b / jnp.maximum(jnp.linalg.norm(b, axis=1, keepdims=True), 1e-6)
    return jnp.mean((a.T @ b) ** 2)


@MODELS.register("misa")
class MISA(_BaselineBase):
    """Modality-Invariant and -Specific representations (Hazarika et al.
    2020). Per-modality utterance encoders project into a shared (invariant)
    space and private (specific) spaces; CMD pulls the invariant spaces
    together, an orthogonality loss pushes private apart from shared, and a
    decoder reconstructs each utterance vector from private+shared. The six
    vectors fuse through a small self-attention transformer."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, audio, text, video, *, t_max: Optional[Tuple] = None,
                 missing: bool = False, deterministic: bool = True):
        from sdumc_tpu.models.modules import CrossModalTransformerEncoder

        cfg = self.cfg
        h = cfg.baseline_hidden_dim
        tm = t_max or (None, None, None)
        utts = [
            ModalityEncoder(h, cfg.dropout, name=n)(x, t, deterministic)
            for n, x, t in (("audio_enc", audio, tm[0]),
                            ("text_enc", text, tm[1]),
                            ("video_enc", video, tm[2]))
        ]
        shared = nn.Dense(h, name="shared_proj")      # one encoder, 3 uses
        inv = [nn.sigmoid(shared(u)) for u in utts]
        spec = [nn.sigmoid(nn.Dense(h, name=f"private_{m}")(u))
                for m, u in zip("atv", utts)]

        # computed unconditionally so every param exists at init (flax
        # creates params at call time); eval discards aux anyway
        sim = (_cmd_loss(inv[0], inv[1]) + _cmd_loss(inv[0], inv[2])
               + _cmd_loss(inv[1], inv[2])) / 3.0
        diff = sum(_diff_loss(s, i) for s, i in zip(spec, inv)) / 3.0
        dec = nn.Dense(h, name="recon_dec")
        recon = sum(
            jnp.mean((dec(s + i) - jax.lax.stop_gradient(u)) ** 2)
            for s, i, u in zip(spec, inv, utts)) / 3.0
        model_loss = (cfg.misa_sim_w * sim + cfg.misa_diff_w * diff
                      + cfg.misa_recon_w * recon)

        stack = jnp.stack(inv + spec, axis=1)                     # [B, 6, h]
        fused = CrossModalTransformerEncoder(
            dim=h, layers=1, heads=2, dropout=cfg.dropout,
            scale_embeds=False, name="fusion_tr")(
                stack, deterministic=deterministic)
        f = fused.reshape(fused.shape[0], -1)                     # [B, 6h]
        f = nn.relu(nn.Dense(h, name="post_fc1")(f))
        vals = nn.Dense(cfg.output_dim, name="out")(f)
        aux = self._aux(f, utts[1], deterministic)
        aux["model_loss"] = model_loss
        return vals, aux


def _infonce(scores: jnp.ndarray) -> jnp.ndarray:
    """NCE lower bound from a [B, B] score matrix whose diagonal holds the
    positive pairs (returned as a loss, i.e. the negative bound)."""
    return -jnp.mean(jnp.diag(jax.nn.log_softmax(scores, axis=-1)))


@MODELS.register("mmim")
class MMIM(_BaselineBase):
    """MultiModal InfoMax (Han et al. 2021): hierarchical mutual-information
    maximisation. beta-weighted InfoNCE bounds tie text to audio/video at the
    input level; alpha-weighted CPC critics tie the fusion result back to
    each modality representation. Batch items serve as the negatives."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, audio, text, video, *, t_max: Optional[Tuple] = None,
                 missing: bool = False, deterministic: bool = True):
        cfg = self.cfg
        h = cfg.baseline_hidden_dim
        tm = t_max or (None, None, None)
        za, zt, zv = [
            ModalityEncoder(h, cfg.dropout, name=n)(x, t, deterministic)
            for n, x, t in (("audio_enc", audio, tm[0]),
                            ("text_enc", text, tm[1]),
                            ("video_enc", video, tm[2]))
        ]
        f = jnp.concatenate([za, zt, zv], axis=-1)
        f = nn.Dropout(cfg.dropout, deterministic=deterministic)(f)
        f = nn.relu(nn.Dense(h, name="post_fc1")(f))
        vals = nn.Dense(cfg.output_dim, name="out")(f)

        # computed unconditionally so every param exists at init; eval
        # discards aux. input-level bounds: text <-> {audio, video}
        ta = _infonce(zt @ nn.Dense(h, use_bias=False, name="W_ta")(za).T)
        tv = _infonce(zt @ nn.Dense(h, use_bias=False, name="W_tv")(zv).T)
        # CPC critics: fusion result -> each modality (cpc_layers deep)
        cpc = 0.0
        for m, z in (("a", za), ("t", zt), ("v", zv)):
            pred = f
            for li in range(cfg.baseline_layers):
                pred = nn.Dense(h, name=f"cpc_{m}_{li}")(pred)
                if li < cfg.baseline_layers - 1:
                    pred = nn.relu(pred)
            cpc = cpc + _infonce(pred @ z.T)
        model_loss = cfg.mmim_beta * (ta + tv) + cfg.mmim_alpha * cpc

        aux = self._aux(f, zt, deterministic)
        aux["model_loss"] = model_loss
        return vals, aux
