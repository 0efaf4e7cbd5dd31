"""Fused dual-view forward: ONE [2B]-row apply == two single-view applies.

The train/eval steps stack the teacher (gt-text) and student (feat4) views
along batch after the shared input projections (models/fusion.py dual=True,
train/step.py _apply_views) — rows never mix (per-row softmaxes, per-row
dropout), so per-view numerics must be identical to the reference's two
forwards (main_frame_val_text_missing.py:130-131). These tests pin that,
including different text/feat4 buckets + per-row t_max masking, gradients,
and the step-level wiring.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sdumc_tpu.core.config import LossConfig, ModelConfig
from sdumc_tpu.models.fusion import SDUMCFusion
from sdumc_tpu.ops.masking import mask_time_scores
from sdumc_tpu.train.step import dual_view_loss, make_eval_step

INPUT_DIMS = (24, 48, 24)


def _cfg(**kw):
    return ModelConfig(input_dims=INPUT_DIMS, general_dim=32,
                       layers=(32, 16), fused_layers=(32, 32),
                       rnc_proj_dim=8, **kw)


def _batch(B=6, ta=7, tt=5, tv=6, tf4=4, pad_t=0, pad_f4=0, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "audio": jnp.asarray(rng.normal(size=(B, ta, INPUT_DIMS[0])).astype(np.float32)),
        "text": jnp.asarray(np.pad(
            rng.normal(size=(B, tt, INPUT_DIMS[1])).astype(np.float32),
            ((0, 0), (0, pad_t), (0, 0)))),
        "feat4": jnp.asarray(np.pad(
            rng.normal(size=(B, tf4, INPUT_DIMS[1])).astype(np.float32),
            ((0, 0), (0, pad_f4), (0, 0)))),
        "video": jnp.asarray(rng.normal(size=(B, tv, INPUT_DIMS[2])).astype(np.float32)),
        "vals": jnp.asarray(rng.uniform(-3, 3, size=(B,)).astype(np.float32)),
        "t_max": (jnp.int32(ta), jnp.int32(tt), jnp.int32(tv), jnp.int32(tf4)),
    }


def test_mask_time_scores_vector():
    scores = jnp.asarray(np.random.default_rng(1).normal(size=(3, 5, 2)).astype(np.float32))
    t = jnp.asarray([2, 5, 0], jnp.int32)
    got = mask_time_scores(scores, t, axis=1)
    for b, tb in enumerate([2, 5, 0]):
        np.testing.assert_array_equal(np.asarray(got[b, :tb]), np.asarray(scores[b, :tb]))
        assert (np.asarray(got[b, tb:]) <= -1e29).all()
    # scalar path unchanged
    np.testing.assert_array_equal(
        np.asarray(mask_time_scores(scores, 5, axis=1)), np.asarray(scores))


@pytest.mark.parametrize("pad_f4", [0, 3])  # unequal buckets exercise the repad
def test_dual_forward_matches_two_applies(pad_f4):
    cfg = _cfg()
    model = SDUMCFusion(cfg)
    b = _batch(pad_f4=pad_f4)
    params = model.init(
        jax.random.PRNGKey(0), b["audio"], b["text"], b["video"],
        t_max=(7, 5, 6))["params"]
    ta, tt, tv, tf4 = b["t_max"]

    v0, a0 = model.apply({"params": params}, b["audio"], b["text"], b["video"],
                         t_max=(ta, tt, tv), missing=False, deterministic=True)
    v1, a1 = model.apply({"params": params}, b["audio"], b["feat4"], b["video"],
                         t_max=(ta, tf4, tv), missing=True, deterministic=True)
    v01, a01 = model.apply({"params": params},
                           b["audio"], (b["text"], b["feat4"]), b["video"],
                           t_max=(ta, (tt, tf4), tv), dual=True,
                           deterministic=True)
    B = b["audio"].shape[0]
    np.testing.assert_allclose(np.asarray(v01[:B]), np.asarray(v0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(v01[B:]), np.asarray(v1), atol=1e-6)
    for key in ("features", "rnc", "text_feat", "text_query_feat"):
        np.testing.assert_allclose(np.asarray(a01[key][:B]), np.asarray(a0[key]),
                                   atol=1e-6, err_msg=key)
        np.testing.assert_allclose(np.asarray(a01[key][B:]), np.asarray(a1[key]),
                                   atol=1e-6, err_msg=key)


def test_fused_loss_and_grads_match_unfused():
    """dual_view_loss routes through the fused path for SDUMCFusion; with
    dropout off the loss AND grads must match the two-apply formulation."""
    cfg = _cfg(dropout=0.0, attn_dropout=0.0)
    model = SDUMCFusion(cfg)
    b = _batch(seed=3)
    params = model.init(jax.random.PRNGKey(0), b["audio"], b["text"],
                        b["video"], t_max=(7, 5, 6))["params"]
    loss_cfg = LossConfig()
    rng = jax.random.PRNGKey(7)

    def fused(p):
        return dual_view_loss(model, p, b, loss_cfg, rng, False)[0]

    class TwoApply:
        """Same module, fusable flag hidden -> forces the two-apply path."""
        cfg = model.cfg

        @staticmethod
        def apply(*a, **k):
            return model.apply(*a, **k)

    def unfused(p):
        return dual_view_loss(TwoApply(), p, b, loss_cfg, rng, False)[0]

    lf, gf = jax.value_and_grad(fused)(params)
    lu, gu = jax.value_and_grad(unfused)(params)
    np.testing.assert_allclose(float(lf), float(lu), rtol=1e-6)
    flat_f = jax.tree_util.tree_leaves_with_path(gf)
    flat_u = {p: l for p, l in jax.tree_util.tree_leaves_with_path(gu)}
    for p, l in flat_f:
        np.testing.assert_allclose(np.asarray(l), np.asarray(flat_u[p]),
                                   atol=2e-5, rtol=2e-4, err_msg=str(p))


def test_eval_step_uses_fused_path():
    cfg = _cfg()
    model = SDUMCFusion(cfg)
    b = _batch(seed=5)
    params = model.init(jax.random.PRNGKey(1), b["audio"], b["text"],
                        b["video"], t_max=(7, 5, 6))["params"]
    v0, v1 = make_eval_step(model)(params, b)
    ta, tt, tv, _ = b["t_max"]
    rv0, _ = model.apply({"params": params}, b["audio"], b["text"], b["video"],
                         t_max=(ta, tt, tv), missing=False, deterministic=True)
    np.testing.assert_allclose(np.asarray(v0), np.asarray(rv0).reshape(-1),
                               atol=1e-6)
    assert v1.shape == v0.shape
