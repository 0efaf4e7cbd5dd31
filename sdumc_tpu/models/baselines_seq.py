"""Sequence-level baseline fusion families: MFN, Graph-MFN, MFM, MCTN, MulT.

The reference's MODEL_MAP names these (toolkit/models/__init__.py:7-27) and
marks mfn/graph_mfn/mfm/mctn "align only" (:46-50), but ships no code — only
the hyperparameter grids survive (model-tune.yaml:24-80). Clean-room
implementations from the papers (Zadeh et al. 2018 MFN; Zadeh et al. 2018
Graph-MFN/DFG; Tsai et al. 2019 MFM; Pham et al. 2019 MCTN; Tsai et al.
2019 MulT), built TPU-first:

- recurrence is ``nn.scan`` over time (one compiled step body, no Python
  loops over T);
- the align-only families align **in-model** via a differentiable linear
  time-resample of each modality to a fixed ``baseline_align_t`` grid —
  static shapes under jit, where the reference requires pre-aligned
  features on disk;
- each family speaks the same dual-view interface as SDUMCFusion
  (audio, text, video, t_max, missing) -> (vals, aux), so the existing
  distillation train loop drives them unchanged; model-specific
  self-supervised terms (MFM reconstruction+MMD, MCTN cycle translation)
  ride in ``aux["model_loss"]``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from sdumc_tpu.core.config import ModelConfig
from sdumc_tpu.core.registry import MODELS
from sdumc_tpu.models.baselines import _BaselineBase
from sdumc_tpu.models.modules import CrossModalTransformerEncoder


def resample_time(x: jnp.ndarray, t_max, t_out: int) -> jnp.ndarray:
    """Linearly resample the first ``t_max`` frames of ``x`` [B, T, D] onto a
    fixed ``t_out`` grid -> [B, t_out, D]. ``t_max`` may be a traced scalar;
    the output shape stays static (one compiled program per bucket combo)."""
    T = x.shape[1]
    t = jnp.asarray(T if t_max is None else t_max, jnp.float32)
    pos = (jnp.arange(t_out, dtype=jnp.float32) + 0.5) / t_out * t - 0.5
    pos = jnp.clip(pos, 0.0, jnp.maximum(t - 1.0, 0.0))
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, jnp.maximum(t.astype(jnp.int32) - 1, 0))
    w = (pos - lo)[None, :, None]
    return jnp.take(x, lo, axis=1) * (1.0 - w) + jnp.take(x, hi, axis=1) * w


def _align_inputs(cfg, audio, text, video, t_max):
    tm = t_max or (None, None, None)
    ta = cfg.baseline_align_t
    return (resample_time(audio, tm[0], ta),
            resample_time(text, tm[1], ta),
            resample_time(video, tm[2], ta))


class _MFNStep(nn.Module):
    """One synchronized timestep of the Memory Fusion Network: three LSTMs
    advance in lockstep; the Delta-memory Attention Network attends over the
    concatenated old+new LSTM memories; a gated multi-view memory
    integrates the attended cross-view signal."""

    hidden: int
    mem: int
    use_graph: bool = False   # Graph-MFN: DFG replaces the DMAN input

    @nn.compact
    def __call__(self, carry, xs):
        (sa, st, sv), u = carry
        xa, xt, xv = xs
        new_a, _ = nn.OptimizedLSTMCell(self.hidden, name="lstm_a")(sa, xa)
        new_t, _ = nn.OptimizedLSTMCell(self.hidden, name="lstm_t")(st, xt)
        new_v, _ = nn.OptimizedLSTMCell(self.hidden, name="lstm_v")(sv, xv)

        if self.use_graph:
            z = DynamicFusionGraph(self.mem, name="dfg")(
                new_a[1], new_t[1], new_v[1])
        else:
            c_old = jnp.concatenate([sa[0], st[0], sv[0]], axis=-1)
            c_new = jnp.concatenate([new_a[0], new_t[0], new_v[0]], axis=-1)
            cc = jnp.concatenate([c_old, c_new], axis=-1)        # [B, 6H]
            a = jax.nn.softmax(nn.Dense(cc.shape[-1], name="dman_fc2")(
                nn.relu(nn.Dense(self.mem, name="dman_fc1")(cc))), axis=-1)
            z = nn.relu(nn.Dense(self.mem, name="attended_proj")(cc * a))

        g1 = nn.sigmoid(nn.Dense(self.mem, name="gamma1")(z))
        g2 = nn.sigmoid(nn.Dense(self.mem, name="gamma2")(z))
        u_hat = nn.tanh(nn.Dense(self.mem, name="u_hat")(z))
        u = g1 * u + g2 * u_hat
        return ((new_a, new_t, new_v), u), None


class DynamicFusionGraph(nn.Module):
    """Graph-MFN's Dynamic Fusion Graph over the three singleton views:
    pair and triple vertices are MLPs of their parents, every edge carries a
    data-driven sigmoid efficacy, and the output vertex is the
    efficacy-weighted sum of all seven vertex embeddings."""

    dim: int

    @nn.compact
    def __call__(self, sa, st, sv):
        cat = jnp.concatenate([sa, st, sv], axis=-1)
        eff = nn.sigmoid(nn.Dense(19, name="efficacies")(cat))
        va = nn.tanh(nn.Dense(self.dim, name="v_a")(sa))
        vt = nn.tanh(nn.Dense(self.dim, name="v_t")(st))
        vv = nn.tanh(nn.Dense(self.dim, name="v_v")(sv))
        e = [eff[:, i:i + 1] for i in range(19)]
        p_at = nn.tanh(nn.Dense(self.dim, name="v_at")(
            jnp.concatenate([va * e[0], vt * e[1]], axis=-1)))
        p_av = nn.tanh(nn.Dense(self.dim, name="v_av")(
            jnp.concatenate([va * e[2], vv * e[3]], axis=-1)))
        p_tv = nn.tanh(nn.Dense(self.dim, name="v_tv")(
            jnp.concatenate([vt * e[4], vv * e[5]], axis=-1)))
        tri = nn.tanh(nn.Dense(self.dim, name="v_atv")(jnp.concatenate(
            [va * e[6], vt * e[7], vv * e[8],
             p_at * e[9], p_av * e[10], p_tv * e[11]], axis=-1)))
        verts = [va, vt, vv, p_at, p_av, p_tv, tri]
        return sum(v * e[12 + i] for i, v in enumerate(verts))


class _MFNCore(_BaselineBase):
    """Shared MFN / Graph-MFN body (the two differ only in the per-step
    cross-view integrator)."""

    cfg: ModelConfig
    use_graph: bool = False

    @nn.compact
    def __call__(self, audio, text, video, *, t_max: Optional[Tuple] = None,
                 missing: bool = False, deterministic: bool = True):
        cfg = self.cfg
        h, m = cfg.baseline_hidden_dim, cfg.baseline_mem_dim
        xa, xt, xv = _align_inputs(cfg, audio, text, video, t_max)
        xa = nn.Dense(h, name="proj_a")(xa)
        xt = nn.Dense(h, name="proj_t")(xt)
        xv = nn.Dense(h, name="proj_v")(xv)

        B = audio.shape[0]
        zeros = jnp.zeros((B, h), xa.dtype)
        carry0 = (((zeros, zeros),) * 3, jnp.zeros((B, m), xa.dtype))
        Scan = nn.scan(_MFNStep, variable_broadcast="params",
                       split_rngs={"params": False}, in_axes=1, out_axes=1)
        ((sa, st, sv), u), _ = Scan(h, m, self.use_graph, name="steps")(
            carry0, (xa, xt, xv))

        f = jnp.concatenate([sa[1], st[1], sv[1], u], axis=-1)
        f = nn.Dropout(cfg.dropout, deterministic=deterministic)(f)
        f = nn.relu(nn.Dense(h, name="post_fc1")(f))
        vals = nn.Dense(cfg.output_dim, name="out")(f)
        return vals, self._aux(f, st[1], deterministic)


@MODELS.register("mfn")
class MFN(_MFNCore):
    cfg: ModelConfig
    use_graph: bool = False


@MODELS.register("graph_mfn")
class GraphMFN(_MFNCore):
    cfg: ModelConfig
    use_graph: bool = True


def _rbf_mmd(x: jnp.ndarray, y: jnp.ndarray,
             sigmas=(1.0, 2.0, 4.0)) -> jnp.ndarray:
    """Multi-bandwidth RBF-kernel Maximum Mean Discrepancy (MFM's prior
    matching between factor batches and N(0, I) samples)."""

    def k(a, b):
        d = jnp.sum((a[:, None, :] - b[None, :, :]) ** 2, axis=-1)
        return sum(jnp.exp(-d / (2.0 * s * s)) for s in sigmas)

    return jnp.mean(k(x, x)) + jnp.mean(k(y, y)) - 2.0 * jnp.mean(k(x, y))


@MODELS.register("mfm")
class MFM(_BaselineBase):
    """Multimodal Factorization Model: LSTM encoders infer one
    multimodal-discriminative factor F_y and per-modality generative factors
    F_m; GRU decoders reconstruct each (projected) sequence from
    [F_m, F_y]; MMD matches every factor to a N(0, I) prior. Prediction
    reads F_y only. Reconstruction targets live in the projected space
    (stop-gradient), a documented simplification of the paper's raw-input
    decoders that keeps the decode graph modality-size independent."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, audio, text, video, *, t_max: Optional[Tuple] = None,
                 missing: bool = False, deterministic: bool = True):
        cfg = self.cfg
        h, m = cfg.baseline_hidden_dim, cfg.baseline_mem_dim
        seqs = _align_inputs(cfg, audio, text, video, t_max)
        projs, qs = [], []
        for name, x in zip("atv", seqs):
            p = nn.Dense(h, name=f"proj_{name}")(x)            # [B, Ta, h]
            projs.append(p)
            hs = nn.RNN(nn.OptimizedLSTMCell(h), name=f"enc_{name}")(p)
            qs.append(hs[:, -1])
        f_y = nn.Dense(m, name="factor_y")(
            nn.relu(nn.Dense(h, name="factor_y_pre")(
                jnp.concatenate(qs, axis=-1))))
        f_ms = [nn.Dense(m, name=f"factor_{n}")(q)
                for n, q in zip("atv", qs)]

        # decoders run unconditionally so every param exists at init (flax
        # creates params at call time); the rng-dependent MMD prior match is
        # train-only (eval apply carries no rng and discards aux anyway)
        t_align = cfg.baseline_align_t
        recon = 0.0
        for name, f_m, p in zip("atv", f_ms, projs):
            code = jnp.concatenate([f_m, f_y], axis=-1)         # [B, 2m]
            steps = jnp.repeat(code[:, None, :], t_align, axis=1)
            dec = nn.RNN(nn.GRUCell(h), name=f"dec_{name}")(steps)
            rec = nn.Dense(h, name=f"dec_out_{name}")(dec)
            recon = recon + jnp.mean(
                (rec - jax.lax.stop_gradient(p)) ** 2)
        model_loss = cfg.mfm_recon_w * recon
        if not deterministic:
            rng = self.make_rng("dropout")
            mmd = 0.0
            for i, fac in enumerate(f_ms + [f_y]):
                noise = jax.random.normal(
                    jax.random.fold_in(rng, i), fac.shape, fac.dtype)
                mmd = mmd + _rbf_mmd(fac, noise)
            model_loss = model_loss + cfg.mfm_mmd_w * mmd

        f = nn.relu(nn.Dense(h, name="post_fc1")(f_y))
        f = nn.Dropout(cfg.dropout, deterministic=deterministic)(f)
        vals = nn.Dense(cfg.output_dim, name="out")(f)
        aux = self._aux(f, f_ms[1], deterministic)
        aux["model_loss"] = model_loss
        return vals, aux


class _TFStep(nn.Module):
    """One GRU decode step with per-step teacher forcing: the input is the
    ground-truth previous frame where the (pre-sampled) mask says so, else
    the model's own previous prediction."""

    hidden: int

    @nn.compact
    def __call__(self, carry, xs):
        state, prev = carry
        gt_prev, use_gt = xs
        inp = jnp.where(use_gt, gt_prev, prev)
        state, y = nn.GRUCell(self.hidden, name="cell")(state, inp)
        pred = nn.Dense(self.hidden, name="out")(y)
        return (state, pred), pred


class _TFGRUDecoder(nn.Module):
    """Teacher-forced GRU sequence decoder (MCTN's translation decoder)."""

    hidden: int

    @nn.compact
    def __call__(self, h0, targets, tf_mask):
        B, T, H = targets.shape
        gt_prev = jnp.concatenate(
            [jnp.zeros_like(targets[:, :1]), targets[:, :-1]], axis=1)
        mask = jnp.broadcast_to(tf_mask[None, :, None], (B, T, 1))
        Scan = nn.scan(_TFStep, variable_broadcast="params",
                       split_rngs={"params": False}, in_axes=1, out_axes=1)
        carry0 = (h0, jnp.zeros((B, H), targets.dtype))
        _, preds = Scan(self.hidden, name="steps")(carry0, (gt_prev, mask))
        return preds


@MODELS.register("mctn")
class MCTN(_BaselineBase):
    """Multimodal Cyclic Translation Network (hierarchical): a GRU seq2seq
    translates text->audio and cyclically back audio_hat->text; a second
    level encodes the level-1 joint representation and translates it to
    video. Regression reads the level-2 encoder's final state. Translation
    and cycle losses (MSE in the shared projected space) are weighted by
    ``mctn_cycle_w``; teacher forcing is sampled per step at
    ``mctn_teacher_forcing`` during training."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, audio, text, video, *, t_max: Optional[Tuple] = None,
                 missing: bool = False, deterministic: bool = True):
        cfg = self.cfg
        h = cfg.baseline_hidden_dim
        t_align = cfg.baseline_align_t
        xa, xt, xv = _align_inputs(cfg, audio, text, video, t_max)
        pa = nn.Dense(h, name="proj_a")(xa)
        pt = nn.Dense(h, name="proj_t")(xt)
        pv = nn.Dense(h, name="proj_v")(xv)

        if deterministic:
            tf_mask = jnp.zeros((t_align,), bool)
        else:
            tf_mask = jax.random.uniform(
                self.make_rng("dropout"), (t_align,)
            ) < cfg.mctn_teacher_forcing

        enc1 = nn.RNN(nn.GRUCell(h), name="enc1")
        joint = enc1(pt)                                        # [B, Ta, h]
        dec_a = _TFGRUDecoder(h, name="dec_a")
        a_hat = dec_a(joint[:, -1], pa, tf_mask)
        cyc_joint = enc1(a_hat)
        t_hat = _TFGRUDecoder(h, name="dec_t")(cyc_joint[:, -1], pt, tf_mask)

        enc2 = nn.RNN(nn.GRUCell(h), name="enc2")
        joint2 = enc2(joint)
        v_hat = _TFGRUDecoder(h, name="dec_v")(joint2[:, -1], pv, tf_mask)

        model_loss = 0.0
        if not deterministic:
            sg = jax.lax.stop_gradient
            trans = (jnp.mean((a_hat - sg(pa)) ** 2)
                     + jnp.mean((t_hat - sg(pt)) ** 2)
                     + jnp.mean((v_hat - sg(pv)) ** 2))
            model_loss = cfg.mctn_cycle_w * trans

        f = nn.relu(nn.Dense(h, name="post_fc1")(joint2[:, -1]))
        f = nn.Dropout(cfg.dropout, deterministic=deterministic)(f)
        vals = nn.Dense(cfg.output_dim, name="out")(f)
        aux = self._aux(f, joint[:, -1], deterministic)
        aux["model_loss"] = model_loss
        return vals, aux


@MODELS.register("mult")
class MULT(_BaselineBase):
    """Multimodal Transformer (Tsai et al. 2019), assembled from the
    rebuilt MulT substrate (models/modules/transformer_encoder.py — the
    reference keeps these modules but strips the model that uses them):
    conv1d temporal projections, two cross-modal transformers per target
    modality, a causal self-attention transformer over the concat, last
    valid timestep of each target, residual output MLP. Works unaligned:
    each modality keeps its own native sequence length."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, audio, text, video, *, t_max: Optional[Tuple] = None,
                 missing: bool = False, deterministic: bool = True):
        cfg = self.cfg
        d = cfg.baseline_hidden_dim
        L, H, K = cfg.baseline_layers, cfg.baseline_heads, cfg.baseline_kernel_size
        tm = t_max or (None, None, None)
        xs = {}
        for name, x in (("a", audio), ("t", text), ("v", video)):
            xs[name] = nn.Conv(d, kernel_size=(K,), padding="SAME",
                               name=f"conv_{name}")(x)

        lasts = []
        for tgt, o1, o2, t in (("a", "t", "v", tm[0]),
                               ("t", "a", "v", tm[1]),
                               ("v", "a", "t", tm[2])):
            c1 = CrossModalTransformerEncoder(
                dim=d, layers=L, heads=H, dropout=cfg.dropout,
                name=f"cross_{tgt}_{o1}")(
                    xs[tgt], xs[o1], deterministic=deterministic)
            c2 = CrossModalTransformerEncoder(
                dim=d, layers=L, heads=H, dropout=cfg.dropout,
                name=f"cross_{tgt}_{o2}")(
                    xs[tgt], xs[o2], deterministic=deterministic)
            hcat = jnp.concatenate([c1, c2], axis=-1)           # [B, T, 2d]
            hself = CrossModalTransformerEncoder(
                dim=2 * d, layers=L, heads=H, dropout=cfg.dropout,
                causal=True, name=f"self_{tgt}")(
                    hcat, deterministic=deterministic)
            idx = (hself.shape[1] - 1 if t is None
                   else jnp.maximum(jnp.asarray(t, jnp.int32) - 1, 0))
            lasts.append(jnp.take(hself, idx, axis=1))          # [B, 2d]

        last = jnp.concatenate(lasts, axis=-1)                  # [B, 6d]
        p = nn.relu(nn.Dense(6 * d, name="post_fc1")(last))
        p = nn.Dropout(cfg.dropout, deterministic=deterministic)(p)
        p = nn.Dense(6 * d, name="post_fc2")(p) + last
        vals = nn.Dense(cfg.output_dim, name="out")(p)
        return vals, self._aux(p, lasts[1], deterministic)
