"""Factored-bias flash attention for WavLM's gated relative position bias.

The einsum path materializes ``gated_bias = gate[b,h,t] * bias[h,t,s]`` and
``scores`` as [B, H, T, T] — at T≈3000 WavLM frames that is >0.5 GB per
tensor and the reason the reference *deletes* its 51 longest train clips
(toolkit/dataloader/cmumosei.py:10-62) and our extractor capped batches by a
frame budget (extract/audio.py). This kernel lifts the O(T²) HBM cap:

* online-softmax (flash) accumulation over key tiles — scores never leave
  VMEM;
* the shared T5-bucketed position bias is **factored through its Toeplitz
  structure**: a [tq, tk] tile's bias depends only on the *tile-offset
  difference* d = kj - qi, so the host precomputes ``bias_tiles
  [2*nTiles-1, H, blk, blk]`` — O(T·blk·H) memory, linear in T — and the
  BlockSpec index map ``d = kj - qi + nq - 1`` streams the right tile to
  each grid step. No [H, T, T] bias is ever built;
* the per-(b,h,t) "gru_rel_pos" gate multiplies the bias tile in-kernel.

Forward-only by design: WavLM extraction is frozen inference (the fusion
net that trains has no WavLM inside). Parity vs the einsum path is exact up
to float reassociation (tests/test_flash_wavlm.py, CPU interpret + TPU).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def bucket_from_rel(rel: jnp.ndarray, num_buckets: int, max_distance: int) -> jnp.ndarray:
    """T5-style bidirectional bucketing of signed relative positions
    (HF WavLMAttention.compute_bias; generalizes models/wavlm.py's
    (q_len, k_len) version to arbitrary rel tensors)."""
    nb = num_buckets // 2
    buckets = (rel > 0).astype(jnp.int32) * nb
    rel = jnp.abs(rel)
    max_exact = nb // 2
    is_small = rel < max_exact
    rel_large = (
        max_exact
        + jnp.log(jnp.maximum(rel, 1).astype(jnp.float32) / max_exact)
        / math.log(max_distance / max_exact)
        * (nb - max_exact)
    ).astype(jnp.int32)
    rel_large = jnp.minimum(rel_large, nb - 1)
    return buckets + jnp.where(is_small, rel, rel_large)


def bias_tiles_for(rel_embed: jnp.ndarray, n_tiles: int, block: int,
                   num_buckets: int, max_distance: int) -> jnp.ndarray:
    """[num_buckets, H] embedding -> [2*n_tiles-1, H, block, block] tile
    table. Tile d holds bias(rel) for rel = (d - n_tiles + 1)*block + s - t;
    grid step (qi, kj) reads tile d = kj - qi + n_tiles - 1."""
    d = jnp.arange(2 * n_tiles - 1)[:, None, None] - (n_tiles - 1)
    t = jnp.arange(block)[None, :, None]
    s = jnp.arange(block)[None, None, :]
    rel = d * block + s - t                                   # [n_d, blk, blk]
    buckets = bucket_from_rel(rel, num_buckets, max_distance)
    tiles = jnp.take(rel_embed, buckets, axis=0)              # [n_d, blk, blk, H]
    return jnp.transpose(tiles, (0, 3, 1, 2)).astype(jnp.float32)


def _flash_kernel(q_ref, k_ref, v_ref, bias_ref,
                  out_ref, m_ref, l_ref, acc_ref, *, scale, n_k, hd):
    """q/k arrive AUGMENTED with two extra feature columns (wrapper):

      q[..., hd] = per-(b,h,t) gru_rel_pos gate   k[..., hd]   = 0
      q[..., hd+1] = 1                            k[..., hd+1] = key mask
                                                    (0 valid, NEG/scale pad)

    so ONE MXU dot yields scores-with-key-mask (the 1 x mask column), the
    gate column contributes 0 to the dot and is read back with a static
    lane slice. This sidesteps Mosaic's restrictions on 1-wide / dynamic
    sublane loads and lets gate+mask ride the same DMA as q/k."""
    kj = pl.program_id(3)

    @pl.when(kj == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    qa = q_ref[0, 0].astype(jnp.float32)                       # [blk, hd+2]
    ka = k_ref[0, 0].astype(jnp.float32)                       # [blk, hd+2]
    v = v_ref[0, 0].astype(jnp.float32)                        # [blk, hd]
    gate = qa[:, hd:hd + 1]                                    # [blk, 1]
    bias = bias_ref[0, 0]                                      # [blk, blk] f32

    s = jax.lax.dot_general(
        qa, ka, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale                                                  # mask included
    s = s + gate * bias

    m_prev = m_ref[:]                                          # [blk, 1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p, v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_ref[:] = m_new

    @pl.when(kj == n_k - 1)
    def _():
        out_ref[0, 0] = (acc_ref[:] / l_ref[:]).astype(out_ref.dtype)


def flash_gated_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    gate: jnp.ndarray,
    rel_embed: jnp.ndarray,
    kvalid=None,
    *,
    num_buckets: int,
    max_distance: int,
    block: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """WavLM gated-rel-pos-bias attention, O(T) HBM.

    Args:
      q, k, v: [B, T, H, hd].
      gate: [B, H, T] — the gru_rel_pos gate (gate_a*(gate_b*c-1)+2).
      rel_embed: [num_buckets, H] shared bias embedding.
      kvalid: optional [B, T] bool/float key validity (True/1 = attend).
    Returns [B, T, H, hd] (same dtype as q).
    """
    B, T, H, hd = q.shape
    Tp = ((T + block - 1) // block) * block
    if kvalid is None:
        kvalid = jnp.ones((B, T), jnp.float32)
    kvalid = kvalid.astype(jnp.float32)
    if Tp != T:
        pad = [(0, 0), (0, Tp - T)]
        q = jnp.pad(q, pad + [(0, 0), (0, 0)])
        k = jnp.pad(k, pad + [(0, 0), (0, 0)])
        v = jnp.pad(v, pad + [(0, 0), (0, 0)])
        gate = jnp.pad(gate, [(0, 0), (0, 0), (0, Tp - T)])
        kvalid = jnp.pad(kvalid, pad)

    n = Tp // block
    scale = 1.0 / math.sqrt(hd)
    qt = jnp.transpose(q, (0, 2, 1, 3))                        # [B, H, Tp, hd]
    kt = jnp.transpose(k, (0, 2, 1, 3))
    vt = jnp.transpose(v, (0, 2, 1, 3))
    # augmentation columns (see _flash_kernel docstring)
    gate_col = gate.astype(qt.dtype)[..., None]                # [B, H, Tp, 1]
    ones_col = jnp.ones_like(gate_col)
    qa = jnp.concatenate([qt, gate_col, ones_col], axis=-1)
    zeros_col = jnp.zeros_like(gate_col)
    mask_col = jnp.where(kvalid > 0, 0.0, NEG / scale).astype(qt.dtype)
    mask_col = jnp.broadcast_to(mask_col[:, None, :, None], (B, H, Tp, 1))
    ka = jnp.concatenate([kt, zeros_col, mask_col], axis=-1)
    tiles = bias_tiles_for(rel_embed, n, block, num_buckets, max_distance)

    grid = (B, H, n, n)
    kernel = functools.partial(_flash_kernel, scale=scale, n_k=n, hd=hd)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block, hd + 2), lambda b, h, qi, kj: (b, h, qi, 0)),
            pl.BlockSpec((1, 1, block, hd + 2), lambda b, h, qi, kj: (b, h, kj, 0)),
            pl.BlockSpec((1, 1, block, hd), lambda b, h, qi, kj: (b, h, kj, 0)),
            pl.BlockSpec(
                (1, 1, block, block),
                lambda b, h, qi, kj, _n=n: (kj - qi + _n - 1, h, 0, 0),
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block, hd), lambda b, h, qi, kj: (b, h, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, Tp, hd), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block, 1), jnp.float32),
            pltpu.VMEM((block, 1), jnp.float32),
            pltpu.VMEM((block, hd), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qa, ka, vt, tiles)

    out = jnp.transpose(out, (0, 2, 1, 3))                     # [B, Tp, H, hd]
    return out[:, :T]
