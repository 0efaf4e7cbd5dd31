"""EVA-02 tests: numeric parity vs an independent torch oracle + structure.

timm itself is absent (the dependency the reference pins,
extract_vision_huggingface.py:12), so the numeric oracle is
tests/goldens/make_eva02_golden.py — an independent eager-torch rendering
of the published timm EVA-02 architecture whose state dict + outputs are
checked in as tests/goldens/eva02_tiny.npz. Structural pins (rope algebra,
k-bias absence, sub-LN, CLS exclusion, converter key coverage) remain as
fast diagnostics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdumc_tpu.convert.timm_eva02 import (config_from_state_dict,
                                          eva02_to_params)
from sdumc_tpu.models.eva02 import (Eva02Config, Eva02Model, apply_rope,
                                    rope_2d)


def _init(cfg, B=2):
    model = Eva02Model(cfg)
    px = jnp.asarray(np.random.default_rng(0).normal(
        size=(B, cfg.image_size, cfg.image_size, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), px)["params"]
    return model, params, px


def test_shapes_and_finiteness():
    cfg = Eva02Config.tiny()
    model, params, px = _init(cfg)
    out = model.apply({"params": params}, px)
    P = cfg.num_patches
    assert out["last_hidden_state"].shape == (2, 1 + P, cfg.hidden_size)
    assert out["pooled"].shape == (2, cfg.hidden_size)
    assert np.isfinite(np.asarray(out["pooled"])).all()


def test_rope_preserves_pair_norms():
    sin, cos = rope_2d((4, 4), 16, ref_grid=(4, 4))
    x = np.random.default_rng(1).normal(size=(2, 3, 16, 16)).astype(np.float32)
    y = np.asarray(apply_rope(jnp.asarray(x), jnp.asarray(sin), jnp.asarray(cos)))
    # rotation acts on interleaved pairs -> per-pair L2 norm is invariant
    nx = np.linalg.norm(x.reshape(2, 3, 16, 8, 2), axis=-1)
    ny = np.linalg.norm(y.reshape(2, 3, 16, 8, 2), axis=-1)
    np.testing.assert_allclose(nx, ny, rtol=1e-5, atol=1e-6)


def test_rope_relative_offset_invariance():
    """q·k after rotation depends only on the coordinate offset: compare
    token pairs with equal (dy, dx) at different absolute positions."""
    g = 6
    sin, cos = rope_2d((g, g), 16, ref_grid=(g, g))
    rng = np.random.default_rng(2)
    q = rng.normal(size=(16,)).astype(np.float32)
    k = rng.normal(size=(16,)).astype(np.float32)

    def score(iy, ix, jy, jx):
        qi = apply_rope(jnp.asarray(q)[None], jnp.asarray(sin[iy * g + ix])[None],
                        jnp.asarray(cos[iy * g + ix])[None])[0]
        kj = apply_rope(jnp.asarray(k)[None], jnp.asarray(sin[jy * g + jx])[None],
                        jnp.asarray(cos[jy * g + jx])[None])[0]
        return float(jnp.dot(qi, kj))

    # offset (+2, +1) anchored at two different absolute positions
    np.testing.assert_allclose(score(0, 1, 2, 2), score(3, 2, 5, 3), rtol=1e-5)
    # different offset must (generically) give a different score
    assert abs(score(0, 1, 2, 2) - score(0, 1, 1, 2)) > 1e-4


def test_k_proj_has_no_bias_and_subln_present():
    cfg = Eva02Config.tiny()
    _, params, _ = _init(cfg)
    blk = params["blocks_0"]
    assert "bias" not in blk["k_proj"]
    assert "bias" in blk["q_proj"] and "bias" in blk["v_proj"]
    assert set(blk["mlp_norm"]) == {"scale", "bias"}  # sub-LN inside the FFN
    assert blk["fc1_g"]["kernel"].shape == (cfg.hidden_size, cfg.mlp_hidden)


def test_cls_token_not_rotated():
    """Structurally pin CLS exclusion: every apply_rope call inside the
    model sees exactly num_patches tokens (never 1+P), and rope is active
    (identity tables change the output)."""
    cfg = Eva02Config.tiny(num_layers=1)
    model, params, px = _init(cfg)
    out = model.apply({"params": params}, px)["last_hidden_state"]

    import sdumc_tpu.models.eva02 as mod
    seen_lens = []
    orig_apply, orig_tables = mod.apply_rope, mod.rope_2d
    try:
        def recording_apply(x, sin, cos):
            seen_lens.append(x.shape[-2])
            return orig_apply(x, sin, cos)

        mod.apply_rope = recording_apply
        model.apply({"params": params}, px)

        mod.rope_2d = lambda grid, hd, ref, t: (
            np.zeros((grid[0] * grid[1], hd), np.float32),
            np.ones((grid[0] * grid[1], hd), np.float32))
        out_norope = model.apply({"params": params}, px)["last_hidden_state"]
    finally:
        mod.apply_rope, mod.rope_2d = orig_apply, orig_tables

    assert seen_lens and all(n == cfg.num_patches for n in seen_lens)
    assert float(jnp.abs(out - out_norope).max()) > 1e-4


def _synthetic_timm_sd(cfg: Eva02Config):
    """State dict with the published timm eva02 key schema."""
    rng = np.random.default_rng(3)
    D, Hd, p = cfg.hidden_size, cfg.mlp_hidden, cfg.patch_size

    def t(*shape):
        return rng.normal(size=shape).astype(np.float32) * 0.02

    sd = {
        "cls_token": t(1, 1, D),
        "pos_embed": t(1, cfg.num_patches + 1, D),
        "patch_embed.proj.weight": t(D, 3, p, p),
        "patch_embed.proj.bias": t(D),
        "norm.weight": t(D), "norm.bias": t(D),  # MIM export: final norm
    }
    for i in range(cfg.num_layers):
        pre = f"blocks.{i}."
        sd.update({
            pre + "norm1.weight": t(D), pre + "norm1.bias": t(D),
            pre + "norm2.weight": t(D), pre + "norm2.bias": t(D),
            pre + "attn.q_proj.weight": t(D, D), pre + "attn.q_proj.bias": t(D),
            pre + "attn.k_proj.weight": t(D, D),
            pre + "attn.v_proj.weight": t(D, D), pre + "attn.v_proj.bias": t(D),
            pre + "attn.proj.weight": t(D, D), pre + "attn.proj.bias": t(D),
            pre + "mlp.fc1_g.weight": t(Hd, D), pre + "mlp.fc1_g.bias": t(Hd),
            pre + "mlp.fc1_x.weight": t(Hd, D), pre + "mlp.fc1_x.bias": t(Hd),
            pre + "mlp.norm.weight": t(Hd), pre + "mlp.norm.bias": t(Hd),
            pre + "mlp.fc2.weight": t(D, Hd), pre + "mlp.fc2.bias": t(D),
        })
    return sd


def test_converter_schema_roundtrip():
    cfg = Eva02Config.tiny()
    sd = _synthetic_timm_sd(cfg)
    inferred = config_from_state_dict(sd)
    assert inferred.hidden_size == cfg.hidden_size
    assert inferred.num_layers == cfg.num_layers
    assert inferred.patch_size == cfg.patch_size
    assert inferred.image_size == cfg.image_size
    assert inferred.mlp_hidden == cfg.mlp_hidden

    params = eva02_to_params(sd, cfg)
    model = Eva02Model(cfg)
    px = jnp.asarray(np.random.default_rng(4).normal(
        size=(1, cfg.image_size, cfg.image_size, 3)), jnp.float32)
    # converted tree must be exactly the init tree's structure
    ref = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), px))["params"]
    assert (jax.tree_util.tree_structure(jax.tree_util.tree_map(lambda x: 0, params))
            == jax.tree_util.tree_structure(jax.tree_util.tree_map(lambda x: 0, ref)))
    for (kp, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(params)[0],
            jax.tree_util.tree_flatten_with_path(ref)[0]):
        assert np.shape(a) == b.shape, (kp, np.shape(a), b.shape)
    out = model.apply({"params": params}, px)
    assert np.isfinite(np.asarray(out["pooled"])).all()


def test_base_config_matches_published_recipe():
    """Pin the base recipe the reference loads: 224/14 grid 16x16, width
    768, 12x12, SwiGLU hidden 2048 (= mlp_ratio 4*2/3), head_dim 64."""
    cfg = Eva02Config()
    assert cfg.grid == (16, 16) and cfg.num_patches == 256
    assert cfg.head_dim == 64
    assert cfg.mlp_hidden == int(768 * 4 * 2 / 3)


@pytest.mark.parametrize("B", [1])
def test_extractor_runner_contract(B, tmp_path):
    """build_eva02_runner consumes a raw single-file torch checkpoint."""
    torch = pytest.importorskip("torch")
    cfg = Eva02Config.tiny()
    sd = _synthetic_timm_sd(cfg)
    import json
    d = tmp_path / "eva02"
    d.mkdir()
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()},
               str(d / "pytorch_model.bin"))
    (d / "config.json").write_text(json.dumps({"architecture": "eva02"}))

    from sdumc_tpu.extract.vision_hf import build_eva02_runner
    run, size, mean, std, dim = build_eva02_runner(str(d))
    assert size == cfg.image_size and dim == cfg.hidden_size
    px = np.random.default_rng(5).normal(size=(B, size, size, 3)).astype(np.float32)
    out = np.asarray(run(jnp.asarray(px)))
    assert out.shape == (B, dim) and np.isfinite(out).all()


def test_numeric_parity_vs_torch_golden():
    """Numeric oracle (VERDICT r2 item 6): tests/goldens/eva02_tiny.npz is
    generated by an INDEPENDENT eager-torch rendering of the published timm
    EVA-02 architecture (tests/goldens/make_eva02_golden.py — recipe checked
    in, regenerate with `python tests/goldens/make_eva02_golden.py`). The
    timm-schema state dict goes through the converter into the JAX model;
    outputs must match the torch forward — covering converter transposes,
    key mapping, rope tables, swiglu/sub-LN, and the avg-pool head."""
    import os

    path = os.path.join(os.path.dirname(__file__), "goldens", "eva02_tiny.npz")
    blob = np.load(path)
    sd = {k[3:]: blob[k] for k in blob.files if k.startswith("sd/")}

    cfg = config_from_state_dict(sd)
    assert (cfg.hidden_size, cfg.num_layers, cfg.num_heads) == (128, 2, 2)
    assert (cfg.image_size, cfg.patch_size, cfg.mlp_hidden) == (28, 7, 64)
    params = eva02_to_params(sd, cfg)

    px = jnp.asarray(np.transpose(blob["pixels"], (0, 2, 3, 1)))  # NCHW->NHWC
    out = Eva02Model(cfg).apply({"params": params}, px)
    np.testing.assert_allclose(np.asarray(out["last_hidden_state"]),
                               blob["last_hidden_state"],
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["pooled"]), blob["pooled"],
                               rtol=2e-4, atol=2e-5)
