"""Jit-compiled dual-view self-distillation train/eval steps.

Reference hot loop (main_frame_val_text_missing.py:118-150): per batch, a
full-modality *teacher* forward ``model([a, text_gt, v, False])`` and a
text-missing *student* forward ``model([a, feat4, v, True])``; the mixed
loss (:148) distills teacher representations into the student:

  loss = w_full * MSE(v0)  + w_miss * MSE(v1)
       + w_tf   * RMSE(text_feat_1,       sg(text_feat_0))
       + w_tqf  * RMSE(text_query_feat_1, sg(text_query_feat_0))
       + w_f    * RMSE(features_1, features_0)      # teacher NOT detached!
       + w_rnc  * RnC(stack(rnc_0, rnc_1), vals)

(The reference also computes random 20% frame-dropout masks whose results
are never used, :123-129 — dead code there; here it is a real on-device
augmentation gated by LossConfig.frame_dropout_p, default off.)

The whole dual-view step is one jit graph: both forwards, the loss, the
grad, and the Adam update, with batch data sharded over the mesh's data
axis and params replicated (XLA inserts the grad all-reduce). Device->host
syncs per batch (the reference's per-batch ``.cpu().numpy()``, :156-158) are
replaced by on-device accumulation: the step returns sums, not arrays.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from sdumc_tpu import losses
from sdumc_tpu.core.config import LossConfig


def _fusable(model) -> bool:
    """True when the two views can run as ONE [2B]-row forward: the model
    opts in (SDUMCFusion.dual_view_fusable) and nothing conditions compute
    on the missing flag (use_imagination substitutes only then). Baseline
    families keep the two-apply path — their aux["model_loss"] reduces over
    the batch axis, which a row-stacked forward would halve."""
    return (getattr(model, "dual_view_fusable", False)
            and not getattr(model.cfg, "use_imagination", False))


def _apply_views(model, params, batch, rng0, rng1, deterministic):
    """Run teacher (gt text) + student (feat4) views; fused into one
    [2B]-row apply when the model supports it (per-row numerics identical
    to two applies — tests/test_fused_dual.py). Returns
    (vals0, aux0, vals1, aux1)."""
    ta, tt, tv, tf4 = batch["t_max"]
    kw = dict(deterministic=deterministic)
    if not deterministic:
        kw["rngs"] = {"dropout": rng0}
    if _fusable(model):
        vals01, aux01 = model.apply(
            {"params": params},
            batch["audio"], (batch["text"], batch["feat4"]), batch["video"],
            t_max=(ta, (tt, tf4), tv), dual=True, **kw)
        B = batch["audio"].shape[0]
        head = jax.tree_util.tree_map(lambda a: a[:B], (vals01, aux01))
        tail = jax.tree_util.tree_map(lambda a: a[B:], (vals01, aux01))
        return head[0], head[1], tail[0], tail[1]
    vals0, aux0 = model.apply(
        {"params": params}, batch["audio"], batch["text"], batch["video"],
        t_max=(ta, tt, tv), missing=False, **kw)
    if not deterministic:
        kw["rngs"] = {"dropout": rng1}
    vals1, aux1 = model.apply(
        {"params": params}, batch["audio"], batch["feat4"], batch["video"],
        t_max=(ta, tf4, tv), missing=True, **kw)
    return vals0, aux0, vals1, aux1


def dequant_features(batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """On-device dequantization of an int8 feature-store batch: codes
    ``batch[k]`` (int8) x per-clip per-channel scales ``batch[k + "_scale"]``
    ([B, D] f32) -> bf16 streams. The host ships half the bytes of a bf16
    store (its 1-core producer converts byte width to clips/s one-for-one,
    bench.py bound proof); the widening multiply runs here at HBM speed.
    No-scale batches pass through unchanged."""
    if not any(k.endswith("_scale") for k in batch):
        return batch
    out = dict(batch)
    for k in ("audio", "text", "video", "feat4"):
        s = batch.get(k + "_scale")
        if s is not None:
            out[k] = (batch[k].astype(jnp.bfloat16)
                      * s[:, None, :].astype(jnp.bfloat16))
    return out


def dual_view_loss(
    model,
    params,
    batch: Dict[str, jnp.ndarray],
    loss_cfg: LossConfig,
    rng,
    deterministic: bool = False,
) -> Tuple[jnp.ndarray, Dict[str, Any]]:
    """Compute the mixed distillation loss for one batch dict with keys
    audio/text/video/feat4 [B,T,D], vals [B], t_max (4 traced scalars)."""
    rng0, rng1, rng_aug = jax.random.split(rng, 3)
    batch = dequant_features(batch)
    vals = batch["vals"]

    audio, video = batch["audio"], batch["video"]
    if loss_cfg.frame_dropout_p > 0.0 and not deterministic:
        # on-device frame dropout for the time-series modalities (the
        # reference's dead-code masks, main:123-129, made a real option)
        ka, kv_ = jax.random.split(rng_aug)
        keep_a = jax.random.uniform(ka, (audio.shape[0], audio.shape[1], 1))
        keep_v = jax.random.uniform(kv_, (video.shape[0], video.shape[1], 1))
        audio = audio * (keep_a > loss_cfg.frame_dropout_p)
        video = video * (keep_v > loss_cfg.frame_dropout_p)

    vals0, aux0, vals1, aux1 = _apply_views(
        model, params, dict(batch, audio=audio, video=video),
        rng0, rng1, deterministic)

    sg = jax.lax.stop_gradient
    mse0 = losses.mse_loss(vals0, vals)
    mse1 = losses.mse_loss(vals1, vals)
    rnc = losses.rnc_loss(
        jnp.stack([aux0["rnc"], aux1["rnc"]], axis=1),
        vals[:, None],
        temperature=loss_cfg.rnc_temperature,
    )
    loss = (
        loss_cfg.full_mse_w * mse0
        + loss_cfg.missing_mse_w * mse1
        + loss_cfg.text_feat_w * losses.rmse_loss(aux1["text_feat"], sg(aux0["text_feat"]))
        + loss_cfg.text_query_feat_w
        * losses.rmse_loss(aux1["text_query_feat"], sg(aux0["text_query_feat"]))
        + loss_cfg.features_w * losses.rmse_loss(aux1["features"], aux0["features"])
        + loss_cfg.rnc_w * rnc
        # model-specific self-supervised terms (MISA sim/diff/recon, MMIM
        # CPC bounds, MFM recon/MMD, MCTN cycle translation) ride along as
        # an optional aux entry; families without one contribute nothing
        + aux0.get("model_loss", 0.0)
        + aux1.get("model_loss", 0.0)
    )
    metrics = {
        "loss": loss,
        "mse_full": mse0,
        "mse_missing": mse1,
        "rnc": rnc,
        # on-device accumulation feed for epoch MSE (replaces per-batch
        # .cpu() syncs): sums of squared error and count
        "sq_err_full": jnp.sum((vals0.reshape(-1) - vals) ** 2),
        "sq_err_missing": jnp.sum((vals1.reshape(-1) - vals) ** 2),
        "count": jnp.asarray(vals.shape[0], jnp.float32),
    }
    return loss, metrics


def make_train_step(model, loss_cfg: LossConfig, remat: bool = False):
    """Returns jitted (state, batch, rng) -> (state, metrics).

    ``remat`` wraps the dual-view loss in jax.checkpoint: the backward
    recomputes the forward instead of reading saved activations. Measured
    on v5e at the live shapes it LOSES (12.7 -> 17.5 GB touched, 3985 ->
    3067 clips/s): whole-loss recompute re-reads the big
    [B, T, 1024/4096] feature tensors, which cost more than the saved
    activations. Round-5 re-check after the RnC/dropout fixes: the
    SELECTIVE policy ``dots_with_no_batch_dims_saveable`` (save matmul
    outputs, recompute elementwise) also loses, 19,750 -> 17,744 clips/s
    — the recomputed elementwise chains re-stream the same [2B, T, 256]
    tensors their saves would have held (profiles/hbm_budget.md's gap
    attribution). Kept as an option for regimes where activations
    dominate features (deep stacks over short sequences); off by
    default."""

    loss_for_grad = dual_view_loss
    if remat:
        loss_for_grad = jax.checkpoint(
            dual_view_loss, static_argnums=(0, 3, 5))

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state, batch, rng):
        rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            return loss_for_grad(model, params, batch, loss_cfg, rng, False)

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads=grads)
        return state, metrics

    return train_step


def make_eval_step(model):
    """Returns jitted (params, batch) -> (preds_full, preds_missing).

    Mirrors the reference eval branch (:152-154): both views under no_grad,
    dropout off.
    """

    @jax.jit
    def eval_step(params, batch):
        vals0, _, vals1, _ = _apply_views(
            model, params, dequant_features(batch), None, None, True)
        return vals0.reshape(-1), vals1.reshape(-1)

    return eval_step


def batch_to_device_dict(batch, mesh=None, feature_dtype: str = "float32"):
    """Convert a data.collate.Batch into the jit-ready dict; t_max as traced
    scalars so one compile serves every batch in the same bucket combo.
    feature_dtype="bfloat16" halves the h2d transfer and the HBM reads of
    the big frame tensors (see DataConfig.feature_dtype). int8-store
    batches (batch.scales set) ship their codes verbatim plus the
    ``<key>_scale`` arrays; the jitted step dequantizes on device."""
    quant = getattr(batch, "scales", None)
    cast = (lambda x: x) if feature_dtype == "float32" or quant else (
        lambda x: jnp.asarray(x, jnp.dtype(feature_dtype)))
    d = {
        "audio": cast(batch.audio),
        "text": cast(batch.text),
        "video": cast(batch.video),
        "feat4": cast(batch.feat4),
        "vals": batch.vals,
        "t_max": tuple(jnp.int32(t) for t in batch.t_max),
    }
    if quant:
        for k, s in quant.items():
            d[k + "_scale"] = s
    if mesh is not None:
        from sdumc_tpu.parallel import shard_batch

        arrays = {k: d[k] for k in ("audio", "text", "video", "feat4", "vals")}
        d.update(shard_batch(mesh, arrays))
    return d
