"""Sequence-parallel WavLM forward == single-device forward (8-device CPU
mesh): conv prologue replicated, transformer stack shard_mapped over time
with ring attention (parallel/wavlm_sp.py)."""

import pytest

pytestmark = pytest.mark.slow  # whole-encoder shard_map compiles ~2 min each

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from sdumc_tpu.models.wavlm import WavLMModel
from sdumc_tpu.parallel.wavlm_sp import wavlm_forward_sp
from tests.test_wavlm import _build


def test_wavlm_sp_matches_single_device():
    hf, cfg, params = _build("layer", True)
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))

    rng = np.random.default_rng(0)
    # 900 samples -> T frames, NOT divisible by 8 (exercises the pad path);
    # row 1 shorter (real frame mask)
    wav = jnp.asarray(rng.normal(size=(2, 900)).astype(np.float32))
    t = cfg.output_length(900)
    assert t % 8 != 0
    frame_mask = jnp.asarray(
        np.arange(t)[None, :] < np.array([t, t - 9])[:, None])

    ref = WavLMModel(cfg).apply(
        {"params": params}, wav, pad_mask=frame_mask,
        output_hidden_states=True)
    got = wavlm_forward_sp(cfg, params, wav, mesh, pad_mask=frame_mask,
                           output_hidden_states=True)

    assert len(got["hidden_states"]) == len(ref["hidden_states"])
    mask = np.asarray(frame_mask)[:, :, None]
    for i, (g, r) in enumerate(zip(got["hidden_states"],
                                   ref["hidden_states"])):
        np.testing.assert_allclose(
            np.where(mask, np.asarray(g), 0.0),
            np.where(mask, np.asarray(r), 0.0),
            rtol=3e-5, atol=3e-5, err_msg=f"hidden {i}")


def test_wavlm_sp_no_mask_last_hidden():
    _, cfg, params = _build("layer", True)
    mesh = Mesh(np.array(jax.devices()[:4]), ("data",))
    rng = np.random.default_rng(1)
    wav = jnp.asarray(rng.normal(size=(1, 800)).astype(np.float32))
    ref = WavLMModel(cfg).apply({"params": params}, wav)
    got = wavlm_forward_sp(cfg, params, wav, mesh)
    np.testing.assert_allclose(
        np.asarray(got["last_hidden_state"]),
        np.asarray(ref["last_hidden_state"]), rtol=3e-5, atol=3e-5)
