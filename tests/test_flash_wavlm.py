"""Factored-bias flash attention parity vs the einsum path (CPU interpret
mode; TPU execution covered by scripts/bench_flash.py and bench.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sdumc_tpu.ops.pallas.flash_wavlm import (
    bias_tiles_for, bucket_from_rel, flash_gated_attention)

NB, MD = 40, 100  # tiny bucket config


def einsum_reference(q, k, v, gate, rel_embed, kvalid):
    """The models/wavlm.py einsum path, re-stated standalone."""
    B, T, H, hd = q.shape
    rel = jnp.arange(T)[None, :] - jnp.arange(T)[:, None]
    buckets = bucket_from_rel(rel, NB, MD)
    pb = jnp.transpose(jnp.take(rel_embed, buckets, axis=0), (2, 0, 1))
    scores = jnp.einsum("bthd,bshd->bhts", q, k) / jnp.sqrt(hd)
    scores = scores + gate[..., None] * pb[None]
    scores = jnp.where(kvalid[:, None, None, :] > 0, scores, -1e30)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    return jnp.einsum("bhts,bshd->bthd", probs.astype(q.dtype), v)


def _inputs(B=2, T=100, H=4, hd=16, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(B, T, H, hd)).astype(np.float32)
    k = rng.normal(size=(B, T, H, hd)).astype(np.float32)
    v = rng.normal(size=(B, T, H, hd)).astype(np.float32)
    gate = (1.0 + rng.uniform(size=(B, H, T))).astype(np.float32)
    rel_embed = rng.normal(size=(NB, H)).astype(np.float32)
    lengths = rng.integers(T // 2, T + 1, size=B)
    kvalid = (np.arange(T)[None, :] < lengths[:, None]).astype(np.float32)
    return tuple(map(jnp.asarray, (q, k, v, gate, rel_embed, kvalid)))


@pytest.mark.parametrize("T,block", [(100, 32), (256, 128), (130, 64)])
def test_flash_matches_einsum(T, block):
    q, k, v, gate, rel_embed, kvalid = _inputs(T=T)
    ref = einsum_reference(q, k, v, gate, rel_embed, kvalid)
    got = flash_gated_attention(
        q, k, v, gate, rel_embed, kvalid,
        num_buckets=NB, max_distance=MD, block=block, interpret=True)
    # only real (valid-key) rows are consumed downstream
    mask = np.asarray(kvalid)[:, :, None, None] > 0
    np.testing.assert_allclose(
        np.where(mask, np.asarray(got), 0.0),
        np.where(mask, np.asarray(ref), 0.0),
        rtol=2e-5, atol=2e-5,
    )


def test_flash_no_mask():
    q, k, v, gate, rel_embed, _ = _inputs(T=64)
    ref = einsum_reference(q, k, v, gate, rel_embed, jnp.ones((2, 64)))
    got = flash_gated_attention(
        q, k, v, gate, rel_embed, None,
        num_buckets=NB, max_distance=MD, block=32, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_bias_tiles_reconstruct_full_bias():
    """Stitching the Toeplitz tile table back together must reproduce the
    dense [H, T, T] bias exactly."""
    rng = np.random.default_rng(1)
    H, block, n = 4, 32, 3
    T = block * n
    rel_embed = jnp.asarray(rng.normal(size=(NB, H)).astype(np.float32))
    tiles = bias_tiles_for(rel_embed, n, block, NB, MD)
    assert tiles.shape == (2 * n - 1, H, block, block)

    rel = jnp.arange(T)[None, :] - jnp.arange(T)[:, None]
    dense = jnp.transpose(
        jnp.take(rel_embed, bucket_from_rel(rel, NB, MD), axis=0), (2, 0, 1))
    for qi in range(n):
        for kj in range(n):
            d = kj - qi + n - 1
            np.testing.assert_array_equal(
                np.asarray(tiles[d]),
                np.asarray(dense[:, qi * block:(qi + 1) * block,
                                 kj * block:(kj + 1) * block]),
            )


def test_wavlm_model_flash_matches_einsum():
    """Full WavLMModel forward with attention_impl='flash' (interpret on
    CPU) vs 'einsum' — same params, same hidden-state taps, with a real
    batched pad mask (the extract/audio.py production configuration)."""
    import dataclasses

    from sdumc_tpu.models.wavlm import WavLMConfig, WavLMModel

    cfg_e = WavLMConfig.tiny(attention_impl="einsum")
    cfg_f = dataclasses.replace(cfg_e, attention_impl="flash", flash_block=32)
    m_e, m_f = WavLMModel(cfg_e), WavLMModel(cfg_f)

    rng = np.random.default_rng(2)
    wav = jnp.asarray(rng.normal(size=(2, 900)).astype(np.float32))
    t = cfg_e.output_length(900)
    frame_mask = jnp.asarray(
        np.arange(t)[None, :] < np.array([t, t - 9])[:, None])

    params = m_e.init(jax.random.PRNGKey(0), wav)["params"]
    ref = m_e.apply({"params": params}, wav, pad_mask=frame_mask,
                    output_hidden_states=True)
    got = m_f.apply({"params": params}, wav, pad_mask=frame_mask,
                    output_hidden_states=True)

    mask = np.asarray(frame_mask)[:, :, None]
    for i in (-2, -1):
        np.testing.assert_allclose(
            np.where(mask, np.asarray(got["hidden_states"][i]), 0.0),
            np.where(mask, np.asarray(ref["hidden_states"][i]), 0.0),
            rtol=3e-5, atol=3e-5,
        )


def test_flash_trainable_grads_match_einsum():
    """flash_gated_attention_trainable: value via the kernel, gradients via
    the chunked-scan backward — both must match jax.grad of the einsum
    reference for every input (q/k/v/gate/rel_embed)."""
    from sdumc_tpu.ops.pallas.flash_wavlm import flash_gated_attention_trainable

    q, k, v, gate, rel_embed, kvalid = _inputs(T=100, seed=3)
    w = jnp.asarray(
        np.random.default_rng(4).normal(size=q.shape).astype(np.float32))
    vmask = (kvalid[:, :, None, None] > 0).astype(np.float32)

    def loss_ref(q, k, v, gate, rel_embed):
        out = einsum_reference(q, k, v, gate, rel_embed, kvalid)
        return jnp.sum(out * w * vmask)  # pad query rows are never consumed

    def loss_flash(q, k, v, gate, rel_embed):
        out = flash_gated_attention_trainable(
            q, k, v, gate, rel_embed, kvalid,
            num_buckets=NB, max_distance=MD, block=32, chunk=32,
            interpret=True)
        return jnp.sum(out * w * vmask)

    val_ref, grads_ref = jax.value_and_grad(loss_ref, argnums=(0, 1, 2, 3, 4))(
        q, k, v, gate, rel_embed)
    val_got, grads_got = jax.value_and_grad(loss_flash, argnums=(0, 1, 2, 3, 4))(
        q, k, v, gate, rel_embed)

    np.testing.assert_allclose(float(val_got), float(val_ref), rtol=2e-5)
    names = ("dq", "dk", "dv", "dgate", "d_rel_embed")
    for name, g_got, g_ref in zip(names, grads_got, grads_ref):
        np.testing.assert_allclose(
            np.asarray(g_got), np.asarray(g_ref), rtol=3e-4, atol=3e-5,
            err_msg=name)


@pytest.mark.parametrize("head_block,batch_block,exp_base2", [
    (1, 1, False),   # per-head grid
    (2, 2, False),   # partial head + batch packing
    (None, 1, True),  # base-2 softmax domain
    (2, 1, True),
])
def test_flash_variants_match_einsum(head_block, batch_block, exp_base2):
    """The tuning knobs (head packing factor, batch packing, base-2
    softmax) must not change numerics — they only reshape the grid or
    fold constants."""
    q, k, v, gate, rel_embed, kvalid = _inputs(T=96)
    ref = einsum_reference(q, k, v, gate, rel_embed, kvalid)
    got = flash_gated_attention(
        q, k, v, gate, rel_embed, kvalid,
        num_buckets=NB, max_distance=MD, block=32,
        head_block=head_block, batch_block=batch_block,
        exp_base2=exp_base2, interpret=True)
    mask = np.asarray(kvalid)[:, :, None, None] > 0
    np.testing.assert_allclose(
        np.where(mask, np.asarray(got), 0.0),
        np.where(mask, np.asarray(ref), 0.0),
        rtol=2e-5, atol=2e-5,
    )
