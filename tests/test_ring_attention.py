"""Sequence-parallel ring attention == single-device einsum attention
(8-device CPU mesh). The multi-chip long-context answer from SURVEY §5:
time axis sharded over the ring, K/V blocks rotated with ppermute, gated
rel-pos bias regenerated per block offset."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from sdumc_tpu.ops.pallas.flash_wavlm import bucket_from_rel
from sdumc_tpu.parallel.ring_attention import ring_attention_sharded

NB, MD = 40, 100


def einsum_reference(q, k, v, gate, rel_embed, kvalid):
    B, T, H, hd = q.shape
    rel = jnp.arange(T)[None, :] - jnp.arange(T)[:, None]
    buckets = bucket_from_rel(rel, NB, MD)
    pb = jnp.transpose(jnp.take(rel_embed, buckets, axis=0), (2, 0, 1))
    scores = jnp.einsum("bthd,bshd->bhts", q, k) / jnp.sqrt(hd)
    scores = scores + gate[..., None] * pb[None]
    scores = jnp.where(kvalid[:, None, None, :] > 0, scores, -1e30)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    return jnp.einsum("bhts,bshd->bthd", probs.astype(q.dtype), v)


def test_ring_matches_single_device():
    n = 8
    devices = np.array(jax.devices()[:n])
    mesh = Mesh(devices, ("data",))

    B, T, H, hd = 2, 64, 4, 8
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, T, H, hd)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, T, H, hd)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, T, H, hd)).astype(np.float32))
    gate = jnp.asarray((1 + rng.uniform(size=(B, H, T))).astype(np.float32))
    rel_embed = jnp.asarray(rng.normal(size=(NB, H)).astype(np.float32))
    lengths = np.array([T, T - 11])
    kvalid = jnp.asarray(
        (np.arange(T)[None, :] < lengths[:, None]).astype(np.float32))

    ref = einsum_reference(q, k, v, gate, rel_embed, kvalid)
    got = ring_attention_sharded(
        mesh, q, k, v, gate, kvalid, rel_embed,
        num_buckets=NB, max_distance=MD)

    mask = np.asarray(kvalid)[:, :, None, None] > 0
    np.testing.assert_allclose(
        np.where(mask, np.asarray(got), 0.0),
        np.where(mask, np.asarray(ref), 0.0), rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_ring_grads_flow():
    """The ring is differentiable end-to-end (ppermute has a transpose), so
    it can sit inside a fine-tuning graph."""
    n = 4
    mesh = Mesh(np.array(jax.devices()[:n]), ("data",))
    B, T, H, hd = 1, 32, 2, 4
    rng = np.random.default_rng(1)
    args = [jnp.asarray(rng.normal(size=s).astype(np.float32))
            for s in ((B, T, H, hd),) * 3]
    gate = jnp.asarray((1 + rng.uniform(size=(B, H, T))).astype(np.float32))
    rel = jnp.asarray(rng.normal(size=(NB, H)).astype(np.float32))
    kvalid = jnp.ones((B, T), jnp.float32)

    def loss(q, k, v, gate, rel):
        out = ring_attention_sharded(mesh, q, k, v, gate, kvalid, rel,
                                     num_buckets=NB, max_distance=MD)
        return jnp.sum(out ** 2)

    grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(*args, gate, rel)
    ref_grads = jax.grad(
        lambda q, k, v, g, r: jnp.sum(
            einsum_reference(q, k, v, g, r, kvalid) ** 2),
        argnums=(0, 1, 2, 3, 4))(*args, gate, rel)
    for g, r in zip(grads, ref_grads):
        assert np.all(np.isfinite(np.asarray(g)))
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=3e-4, atol=3e-5)
