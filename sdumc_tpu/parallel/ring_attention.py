"""Ring attention over ICI: sequence-parallel WavLM gated-bias attention.

The reference handles long sequences by *data-side reduction* — mean-pool
remap, --feat_scale compression, hard truncation at 1024 frames, and
deleting the 51 longest train clips outright (toolkit/utils/read_data.py:
120-191,309; toolkit/dataloader/cmumosei.py:10-62). The rebuild already
removes the need for that at single-chip scale (bucketing + the
factored-bias flash kernel, O(T) HBM). This module is the multi-chip
answer SURVEY §5 names for sequences past one chip's HBM: shard the time
axis over a mesh axis and rotate K/V blocks around the ring with
``jax.lax.ppermute``, accumulating each query block's softmax online
(flash-style m/l/acc carry) — compute overlaps the neighbor-to-neighbor
ICI transfer, and no device ever holds more than its 1/P sequence slice.

WavLM's gated relative-position bias needs care: block (i queries, j keys)
sees relative positions offset by ``(j - i) * T_local``, so each ring step
regenerates its bias tile from the shared [num_buckets, H] embedding via
the same T5 bucketing the kernels use — the Toeplitz structure means this
is O(T_local^2) per step, never O(T^2) globally.

``ring_gated_attention`` is the per-shard math (call inside shard_map);
``ring_attention_sharded`` wraps it for [B, T, H, hd] global arrays.
Exact: matches the single-device einsum path to float tolerance
(tests/test_ring_attention.py, 8-device CPU mesh).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from sdumc_tpu.ops.pallas.flash_wavlm import NEG, bucket_from_rel


def _block_bias(rel_embed, q_off, k_off, Tl, num_buckets, max_distance):
    """[H, Tl, Tl] bias for queries at global offset q_off vs keys at
    k_off (offsets are traced scalars; shapes stay static)."""
    rel = (jnp.arange(Tl)[None, :] + k_off) - (jnp.arange(Tl)[:, None] + q_off)
    buckets = bucket_from_rel(rel, num_buckets, max_distance)
    return jnp.transpose(jnp.take(rel_embed, buckets, axis=0), (2, 0, 1))


def ring_gated_attention(q, k, v, gate, kvalid, rel_embed, *, axis_name: str,
                         num_buckets: int, max_distance: int):
    """Per-shard ring attention (run under shard_map).

    Args (local shards; T_local = T / ring size):
      q, k, v: [B, T_local, H, hd]
      gate: [B, H, T_local] gru_rel_pos gate for the local queries
      kvalid: [B, T_local] float, 1 = attend, for the local keys
      rel_embed: [num_buckets, H] (replicated)
    Returns [B, T_local, H, hd].
    """
    p = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    B, Tl, H, hd = q.shape
    scale = 1.0 / math.sqrt(hd)
    qf = jnp.transpose(q, (0, 2, 1, 3)).astype(jnp.float32)    # [B,H,Tl,hd]
    gate_f = gate.astype(jnp.float32)[..., None]               # [B,H,Tl,1]

    perm = [(i, (i + 1) % p) for i in range(p)]                # ring shift

    def step(carry, s):
        k_blk, v_blk, valid_blk, m, l, acc = carry
        src = (idx - s) % p                                    # block owner
        bias = _block_bias(rel_embed.astype(jnp.float32),
                           idx * Tl, src * Tl, Tl,
                           num_buckets, max_distance)          # [H,Tl,Tl]
        kf = jnp.transpose(k_blk, (0, 2, 1, 3)).astype(jnp.float32)
        vf = jnp.transpose(v_blk, (0, 2, 1, 3)).astype(jnp.float32)
        scores = jnp.einsum("bhtd,bhsd->bhts", qf, kf) * scale
        scores = scores + gate_f * bias[None]
        scores = jnp.where(valid_blk[:, None, None, :] > 0, scores, NEG)

        m_new = jnp.maximum(m, jnp.max(scores, axis=-1, keepdims=True))
        pexp = jnp.exp(scores - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(pexp, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.einsum("bhts,bhsd->bhtd", pexp, vf)

        # rotate K/V (and their validity) to the next device; the collective
        # overlaps the next step's compute under XLA's async scheduling
        k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
        v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
        valid_blk = jax.lax.ppermute(valid_blk, axis_name, perm)
        return (k_blk, v_blk, valid_blk, m_new, l, acc), None

    # mark the accumulators as device-varying over the ring axis (shard_map
    # type system: the carry outputs are varying, so the inputs must be too)
    def pvary(x):
        return jax.lax.pcast(x, (axis_name,), to="varying")

    m0 = pvary(jnp.full((B, H, Tl, 1), NEG, jnp.float32))
    l0 = pvary(jnp.zeros((B, H, Tl, 1), jnp.float32))
    acc0 = pvary(jnp.zeros((B, H, Tl, hd), jnp.float32))
    (_, _, _, _, l, acc), _ = jax.lax.scan(
        step, (k, v, kvalid, m0, l0, acc0), jnp.arange(p))
    out = acc / jnp.maximum(l, 1e-30)
    return jnp.transpose(out, (0, 2, 1, 3)).astype(q.dtype)


def ring_attention_sharded(mesh, q, k, v, gate, kvalid, rel_embed, *,
                           axis_name: str = "data", num_buckets: int,
                           max_distance: int):
    """Global-array wrapper: shards the time axis of q/k/v/gate/kvalid over
    ``axis_name`` and runs the ring. T must divide by the axis size."""
    from jax.sharding import PartitionSpec as P

    n = mesh.shape[axis_name]
    T = q.shape[1]
    assert T % n == 0, (T, n)
    fn = partial(ring_gated_attention, axis_name=axis_name,
                 num_buckets=num_buckets, max_distance=max_distance)
    return jax.shard_map(
        fn, mesh=mesh,
        in_specs=(P(None, axis_name), P(None, axis_name), P(None, axis_name),
                  P(None, None, axis_name), P(None, axis_name), P()),
        out_specs=P(None, axis_name),
    )(q, k, v, gate, kvalid, rel_embed)
