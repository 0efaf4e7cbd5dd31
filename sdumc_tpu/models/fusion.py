"""The SDUMC unified-modality cross-attention fusion network.

TPU-native rebuild of ``WengnetMOSEIMultViewsTextMissing``
(toolkit/models/wengnet_mosei_mult_views_text_missing.py:186-370): three
frame-level modality streams are projected to a shared width, attention-
pooled to utterance vectors, fused through an (unnormalized!) modality-weight
attention, expanded into 7 multimodal queries that cross-attend back over
every modality's frame sequence, re-weighted by the same modality weights,
and collapsed through a 7-slot attention into the prediction head.

Differences from the reference are *representation only*, never semantics:

* Frame softmaxes take a traced ``t_max`` per modality so batches padded to
  a static bucket reproduce the reference's dynamic batch-max padding
  numerics exactly (see ops/masking.py).
* The per-query python loop (:91-93) is one einsum (ops/cross_attention.py).
* The unused-but-checkpointed modules (ResidualAE imagination MLPs :202-203,
  fc_out_e/fc_out_ev :242-244, prelu :257) are still created so the released
  torch checkpoint converts losslessly.

The forward is dual-view-agnostic: the teacher passes gt-text features, the
student passes the audio-derived pseudo-text (feat4) through the *same* text
projection (both 4096-d), exactly as the reference's view-1 call
(main_frame_val_text_missing.py:131).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from sdumc_tpu.core.config import ModelConfig
from sdumc_tpu.core.registry import MODELS
from sdumc_tpu.models.layers import MLP, FrameDropout, Linear
from sdumc_tpu.models.residual_ae import ResidualAE
from sdumc_tpu.ops.masking import mask_time_scores


def _xavier_normal_vector(key, shape, dtype=jnp.float32):
    # torch nn.init.xavier_normal_ on a (1, D) tensor: std = sqrt(2/(1+D)).
    import jax

    fan_in, fan_out = shape[0], shape[1]
    std = (2.0 / (fan_in + fan_out)) ** 0.5
    return std * jax.random.normal(key, shape, dtype)


class FRA2UTTNew(nn.Module):
    """Frame->utterance pooling (reference FRA2UTT_new :46-68).

    use_pallas routes through the fused online-softmax kernel
    (ops/pallas/fused_pool.py); the einsum path additionally returns the
    attention map (the kernel never materializes it).
    """

    dim: int
    softmax_scale: float = 0.3
    dropout: float = 0.5
    use_pallas: bool = False
    dtype: object = None  # frame-stream compute dtype (see Linear.dtype)

    @nn.compact
    def __call__(self, x, *, t_max=None, deterministic: bool = True):
        context = self.param("context", _xavier_normal_vector, (1, self.dim))
        # u8-bit mask dropout for the [B, T, d] stream (see FrameDropout);
        # the pooled [B, d] dropout below stays nn.Dropout
        x = FrameDropout(self.dropout)(x, deterministic=deterministic)
        # the Mosaic kernel prefetches one scalar t_max; per-row vectors
        # (fused dual-view text stream) take the einsum path — param paths
        # match (LinearParams twin), so the branch choice is numerics-free
        if self.use_pallas and not getattr(t_max, "ndim", 0):
            from sdumc_tpu.models.layers import LinearParams
            from sdumc_tpu.ops.pallas import fused_attention_pool

            kernel, bias = LinearParams(self.dim, name="input_proj")(self.dim)
            pooled = fused_attention_pool(
                x, kernel, bias, context[0], t_max,
                softmax_scale=self.softmax_scale,
            )
            attn = None
        else:
            proj = Linear(self.dim, name="input_proj", dtype=self.dtype)
            # scores promote to f32 through the f32 context vector; the
            # softmax and the [B, T] map stay f32 (tiny next to [B, T, d])
            scores = jnp.einsum("btd,d->bt", jnp.tanh(proj(x)), context[0])
            scores = mask_time_scores(self.softmax_scale * scores, t_max, axis=1)
            attn = nn.softmax(scores, axis=1)[..., None]
            pooled = jnp.einsum("btd,bt->bd", x, attn[..., 0])
        pooled = nn.Dropout(self.dropout, deterministic=deterministic)(pooled)
        return pooled, attn


class CrossAttention(nn.Module):
    """7-query cross attention over frames (reference Cross_Attention :70-95).

    use_pallas fuses key-projection + tanh + masked softmax + weighted sum
    (ops/pallas/fused_cross.py); the 7-row query projection stays in XLA.
    """

    dim: int
    softmax_scale: float = 0.3
    dropout: float = 0.5
    use_pallas: bool = False
    dtype: object = None  # frame-stream compute dtype (see Linear.dtype)

    @nn.compact
    def __call__(self, query, x, *, t_max=None, deterministic: bool = True):
        q_proj = Linear(self.dim, name="query_proj", dtype=self.dtype)
        # u8-bit mask dropout for the [B, T, d] stream (see FrameDropout)
        x = FrameDropout(self.dropout)(x, deterministic=deterministic)
        q = q_proj(query)
        if self.use_pallas and not getattr(t_max, "ndim", 0):  # see FRA2UTTNew
            from sdumc_tpu.models.layers import LinearParams
            from sdumc_tpu.ops.pallas import fused_cross_attention

            kernel, bias = LinearParams(self.dim, name="input_proj")(self.dim)
            out = fused_cross_attention(
                q, x, kernel, bias, t_max, softmax_scale=self.softmax_scale
            )
            attn = None
        else:
            k_proj = Linear(self.dim, name="input_proj", dtype=self.dtype)
            k = jnp.tanh(k_proj(x))
            scores = jnp.einsum("btd,bqd->btq", k, q)
            # bf16 frame streams: the [B, T, 7] scores/softmax go back to
            # f32 — stability costs nothing here, the tensor is 1/d the
            # size of the streams the low dtype is shrinking
            scores = mask_time_scores(
                self.softmax_scale * scores.astype(jnp.float32), t_max, axis=1)
            attn = nn.softmax(scores, axis=1)
            out = jnp.einsum("btd,btq->bqd", x, attn.astype(x.dtype))
        out = nn.Dropout(self.dropout, deterministic=deterministic)(out)
        return out, attn


@MODELS.register("wengnet_mosei_mult_views_text_missing")
class SDUMCFusion(nn.Module):
    cfg: ModelConfig

    # train/step.py checks this to fuse the teacher+student views into ONE
    # [2B]-row forward (halves op count and shares the audio/video input
    # projections; the step is op-overhead-bound, not FLOP-bound)
    dual_view_fusable = True

    def __call__(
        self,
        audio: jnp.ndarray,
        text: jnp.ndarray,
        video: jnp.ndarray,
        *,
        t_max: Optional[Tuple] = None,
        missing: bool = False,
        deterministic: bool = True,
        dual: bool = False,
    ):
        """Forward one view.

        Args:
          audio/text/video: [B, T_m, D_m] zero-padded frame features. The
            student view passes feat4 (pseudo-text) as `text`.
          t_max: optional (ta, tt, tv) traced scalars — the dynamic batch-max
            lengths; rows beyond are masked from every time softmax.
          missing: text-missing view flag. Mirrors the reference's batch[-1]
            (:278); triggers imagination substitution only when
            cfg.use_imagination is set (the reference keeps it commented).
          deterministic: disables dropout (eval mode).
          dual: fused dual-view mode — ``text`` is the tuple (text_gt,
            feat4) and ``t_max`` is (ta, (tt_gt, tt_feat4), tv); the two
            views are stacked along batch AFTER the shared input
            projections (teacher rows first), so every downstream op runs
            once at [2B] rows and the audio/video projections run once
            total. All outputs have 2B leading rows; per-row numerics are
            identical to two single-view calls (rows never mix — tested in
            tests/test_fused_dual.py). Requires use_imagination off (the
            substitution is the only missing-conditional compute).

        Returns:
          (vals_out [B, 1], aux dict) where aux carries the distillation
          targets: features (cross_fused_feat), rnc (feat4rnc), text_query
          (post-query-MLP text hidden), cross_text (cross_hiddens[:, 1]),
          attn (the three frame-attention maps).
        """
        cfg = self.cfg
        with jax.default_matmul_precision(cfg.matmul_precision):
            return self._forward(
                audio, text, video, t_max=t_max, missing=missing,
                deterministic=deterministic, dual=dual,
            )

    @nn.compact
    def _forward(self, audio, text, video, *, t_max, missing, deterministic,
                 dual=False):
        cfg = self.cfg
        d = cfg.general_dim
        ta, tt, tv = t_max if t_max is not None else (None, None, None)
        det = deterministic
        use_pallas = cfg.use_pallas == "on"  # "auto" -> XLA path (see config)

        # frame-stream compute dtype: "auto" follows the features' dtype,
        # so f32 inputs (checkpoint-parity paths) run exactly as before
        # while bf16 features (the production store) get bf16 activations
        # through every [B, T, d] stream — the train step's dominant HBM
        # traffic (profiles/step_ops.md). Params and softmaxes stay f32.
        # NOTE (ADVICE r4): CrossAttention's [B, 7, d] output is bf16 on
        # this path (x and attn cast to x.dtype before the weighted sum);
        # the FRA2UTT pooled vectors stay f32 only via promotion through
        # the f32 attention map. Downstream Dense layers promote back to
        # f32, so the bf16 leg costs one extra rounding on tiny tensors.
        cdt = (audio.dtype if getattr(cfg, "compute_dtype", "auto") == "auto"
               else jnp.dtype(cfg.compute_dtype))
        cdt = None if jnp.dtype(cdt) == jnp.float32 else cdt

        # --- input projections (:193-195, :282-284)
        proj_a = Linear(d, name="frame_dim_reshape_0", dtype=cdt)
        proj_t = Linear(d, name="frame_dim_reshape_1", dtype=cdt)
        proj_v = Linear(d, name="frame_dim_reshape_2", dtype=cdt)
        if dual:
            # fused dual-view: project each text stream at its own bucket
            # (shared params), pad the PROJECTED width-d streams to a common
            # T, stack views along batch; duplicate the shared audio/video
            # projections by row-stacking (one projection matmul, one raw
            # [B,T,D_raw] read, instead of two).
            assert not cfg.use_imagination, "fused dual needs imagination off"
            assert t_max is not None, "fused dual needs t_max"
            text_gt, text_ps = text
            tt_gt, tt_ps = tt
            B = audio.shape[0]
            tf_gt, tf_ps = proj_t(text_gt), proj_t(text_ps)
            T_t = max(tf_gt.shape[1], tf_ps.shape[1])
            pad = lambda z: jnp.pad(  # noqa: E731
                z, ((0, 0), (0, T_t - z.shape[1]), (0, 0)))
            text_f = jnp.concatenate([pad(tf_gt), pad(tf_ps)], axis=0)
            tt = jnp.concatenate([
                jnp.broadcast_to(jnp.asarray(tt_gt, jnp.int32), (B,)),
                jnp.broadcast_to(jnp.asarray(tt_ps, jnp.int32), (B,)),
            ])  # per-row text lengths; ta/tv stay scalars (views share them)
            audio_f = proj_a(audio)
            video_f = proj_v(video)
            audio_f = jnp.concatenate([audio_f, audio_f], axis=0)
            video_f = jnp.concatenate([video_f, video_f], axis=0)
        else:
            audio_f = proj_a(audio)
            text_f = proj_t(text)
            video_f = proj_v(video)

        # --- frame->utterance pooling (:288-290)
        pool_a = FRA2UTTNew(d, cfg.softmax_scale, cfg.attn_dropout, use_pallas, dtype=cdt, name="fra2utt_0")
        pool_t = FRA2UTTNew(d, cfg.softmax_scale, cfg.attn_dropout, use_pallas, dtype=cdt, name="fra2utt_1")
        pool_v = FRA2UTTNew(d, cfg.softmax_scale, cfg.attn_dropout, use_pallas, dtype=cdt, name="fra2utt_2")
        audio_pre, attn_a = pool_a(audio_f, t_max=ta, deterministic=det)
        text_pre, attn_t = pool_t(text_f, t_max=tt, deterministic=det)
        video_pre, attn_v = pool_v(video_f, t_max=tv, deterministic=det)

        # --- per-modality MLPs (:210-212, :293-295)
        fused_dims = cfg.fused_layers
        audio_hidden = MLP(fused_dims, cfg.dropout, name="audio_mlp")(audio_pre, deterministic=det)
        text_hidden = MLP(fused_dims, cfg.dropout, name="text_mlp")(text_pre, deterministic=det)
        video_hidden = MLP(fused_dims, cfg.dropout, name="video_mlp")(video_pre, deterministic=det)

        # --- imagination modules: always constructed (params exist in the
        # released checkpoint, :202-203); substitution gated (:297-299).
        imag_text = ResidualAE([128], 1, d, cfg.dropout, name="missing_text_imagination_mlp")
        if cfg.use_imagination and missing:
            text_hidden = imag_text(audio_hidden, text_hidden, video_hidden, deterministic=det)
        elif self.is_initializing():
            imag_text(audio_hidden, text_hidden, video_hidden, deterministic=det)

        # --- modality-weight attention; NOTE: unnormalized, no softmax
        # (:301-304) — the weights are raw fc_att outputs.
        multi_hidden1 = jnp.concatenate([audio_hidden, text_hidden, video_hidden], axis=1)
        att = MLP(fused_dims, cfg.dropout, name="attention_mlp")(multi_hidden1, deterministic=det)
        att = Linear(3, name="fc_att")(att)  # [B, 3]

        hiddens = jnp.stack([audio_hidden, text_hidden, video_hidden], axis=1)  # [B,3,D]
        fused_feat = jnp.einsum("bmd,bm->bd", hiddens, att)
        fused_feat_at = jnp.einsum("bmd,bm->bd", hiddens[:, :2], att[:, :2])
        fused_feat_tv = jnp.einsum("bmd,bm->bd", hiddens[:, 1:], att[:, 1:])
        fused_feat_av = jnp.einsum(
            "bmd,bm->bd", hiddens[:, jnp.array([0, 2])], att[:, jnp.array([0, 2])]
        )

        # --- 7 query MLPs (:324-332); each is a single 256->256 block.
        qdims = (d,)
        fused_q = MLP(qdims, cfg.dropout, name="cross_fused_query_mlp")(fused_feat, deterministic=det)
        at_q = MLP(qdims, cfg.dropout, name="cross_at_query_mlp")(fused_feat_at, deterministic=det)
        tv_q = MLP(qdims, cfg.dropout, name="cross_tv_query_mlp")(fused_feat_tv, deterministic=det)
        av_q = MLP(qdims, cfg.dropout, name="cross_av_query_mlp")(fused_feat_av, deterministic=det)
        audio_q = MLP(qdims, cfg.dropout, name="cross_audio_query_mlp")(audio_hidden, deterministic=det)
        text_q = MLP(qdims, cfg.dropout, name="cross_text_query_mlp")(text_hidden, deterministic=det)
        video_q = MLP(qdims, cfg.dropout, name="cross_video_query_mlp")(video_hidden, deterministic=det)

        multi_query = jnp.stack(
            [fused_q, at_q, tv_q, av_q, audio_q, text_q, video_q], axis=1
        )  # [B, 7, D]

        # --- cross attention back over each modality's frames (:334-336)
        xatt_a = CrossAttention(d, cfg.softmax_scale, cfg.attn_dropout, use_pallas, dtype=cdt, name="cross_att_fra2utt_0")
        xatt_t = CrossAttention(d, cfg.softmax_scale, cfg.attn_dropout, use_pallas, dtype=cdt, name="cross_att_fra2utt_1")
        xatt_v = CrossAttention(d, cfg.softmax_scale, cfg.attn_dropout, use_pallas, dtype=cdt, name="cross_att_fra2utt_2")
        cross_audio, _ = xatt_a(multi_query, audio_f, t_max=ta, deterministic=det)
        cross_text, _ = xatt_t(multi_query, text_f, t_max=tt, deterministic=det)
        cross_video, _ = xatt_v(multi_query, video_f, t_max=tv, deterministic=det)

        layer_dims = cfg.layers  # (256, 128)
        cross_audio = MLP(layer_dims, cfg.dropout, name="cross_audio_mlp")(cross_audio, deterministic=det)
        cross_text = MLP(layer_dims, cfg.dropout, name="cross_text_mlp")(cross_text, deterministic=det)
        cross_video = MLP(layer_dims, cfg.dropout, name="cross_video_mlp")(cross_video, deterministic=det)

        imag_query = ResidualAE(
            [64], 1, layer_dims[-1], cfg.dropout, name="missing_cross_text_query_imagination_mlp"
        )
        if cfg.use_imagination and missing:
            cross_text = imag_query(cross_audio, cross_text, cross_video, deterministic=det)
        elif self.is_initializing():
            imag_query(cross_audio, cross_text, cross_video, deterministic=det)

        # --- re-weighting by the stage-3 modality weights (:346-349)
        cross_hiddens = jnp.stack([cross_audio, cross_text, cross_video], axis=1)  # [B,3,7,H]
        weighted = jnp.einsum("bmqh,bm->bqh", cross_hiddens, att)  # [B,7,H]

        # --- 7-slot attention collapse (:352-358)
        flat = weighted.reshape(weighted.shape[0], -1)  # [B, 7*H]
        cross_att = MLP(layer_dims, cfg.dropout, name="cross_attention_mlp")(flat, deterministic=det)
        cross_att = Linear(7, name="cross_fc_att")(cross_att)  # [B, 7]
        cross_fused_feat = jnp.einsum("bqh,bq->bh", weighted, cross_att)  # [B, H]

        # --- heads (:364-368)
        vals_out = Linear(cfg.output_dim, name="fc_out_v")(cross_fused_feat)
        rnc = Linear(cfg.rnc_proj_dim, name="orgin_linear_change_0")(cross_fused_feat)
        rnc = nn.relu(rnc)
        rnc = Linear(cfg.rnc_proj_dim, name="orgin_linear_change_1")(rnc)

        # Unused-but-checkpointed params (:242-244, :257): create at init so
        # the torch->jax converter maps the full state_dict.
        if self.is_initializing():
            Linear(cfg.output_dim, name="fc_out_e")(cross_fused_feat)
            Linear(cfg.output_dim, name="fc_out_ev")(vals_out)
            # explicit dtype: a weak-typed init here changes its aval after
            # the first optimizer step and silently retraces the train step
            self.param("prelu_weight",
                       lambda k, s: jnp.full(s, 0.25, jnp.float32), (6,))
            nn.LayerNorm(name="layer_normali")(audio_hidden)  # :260, unused

        # Key names follow the reference *loss-side* unpacking
        # (main_frame_val_text_missing.py:120): embeddings = [cross_fused_feat,
        # feat4rnc, text_hidden(post-query-MLP), cross_hiddens[:, 1]].
        aux = {
            "features": cross_fused_feat,          # embeddings[0]
            "rnc": rnc,                            # embeddings[1]
            "text_feat": text_q,                   # embeddings[2]
            "text_query_feat": cross_hiddens[:, 1],  # embeddings[3]
            "attn": (attn_a, attn_t, attn_v),
        }
        return vals_out, aux
