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
                   num_buckets: int, max_distance: int,
                   dtype=jnp.float32, exp_base2: bool = False) -> jnp.ndarray:
    """[num_buckets, H] embedding -> [2*n_tiles-1, H, block, block] tile
    table. Tile d holds bias(rel) for rel = (d - n_tiles + 1)*block + s - t;
    grid step (qi, kj) reads tile d = kj - qi + n_tiles - 1.

    ``dtype``/``exp_base2`` bake the kernel-ready form into the table (bf16
    halves the dominant DMA stream; the base-2 fold multiplies log2(e) in)
    so the per-layer wrapper never re-touches the O(T*blk*H) table — at
    T=3000 the table is ~90 MB and the encoder calls the kernel 24x per
    clip, so a per-layer cast/scale would add ~6 GB of pure HBM traffic."""
    d = jnp.arange(2 * n_tiles - 1)[:, None, None] - (n_tiles - 1)
    t = jnp.arange(block)[None, :, None]
    s = jnp.arange(block)[None, None, :]
    rel = d * block + s - t                                   # [n_d, blk, blk]
    buckets = bucket_from_rel(rel, num_buckets, max_distance)
    tiles = jnp.take(rel_embed, buckets, axis=0)              # [n_d, blk, blk, H]
    tiles = jnp.transpose(tiles, (0, 3, 1, 2)).astype(jnp.float32)
    if exp_base2:
        tiles = tiles * math.log2(math.e)
    return tiles.astype(dtype)


@jax.tree_util.register_static
class _TileMeta:
    """Static fold-state tag carried next to a tile table (hashable)."""

    def __init__(self, block: int, exp_base2: bool):
        self.block, self.exp_base2 = block, exp_base2

    def __eq__(self, o):
        return (isinstance(o, _TileMeta)
                and (self.block, self.exp_base2) == (o.block, o.exp_base2))

    def __hash__(self):
        return hash((self.block, self.exp_base2))


class BiasTileTable(tuple):
    """(tiles, _TileMeta) pair from :func:`bias_tile_table`: the kernel-ready
    tile array plus the (block, exp_base2) fold state baked into it. A table
    built with the wrong base-2 fold or block silently produces wrong
    attention if passed as a raw array; carrying the fold state lets
    flash_gated_attention assert consistency with its own kwargs (ADVICE
    r4). Plain arrays are still accepted (shape-checked only)."""

    def __new__(cls, tiles, block: int, exp_base2: bool):
        return super().__new__(cls, (tiles, _TileMeta(block, exp_base2)))

    @property
    def tiles(self):
        return self[0]

    @property
    def block(self):
        return self[1].block

    @property
    def exp_base2(self):
        return self[1].exp_base2


def bias_tile_table(rel_embed, n_tiles, block, num_buckets, max_distance,
                    dtype=jnp.float32, exp_base2: bool = False):
    """bias_tiles_for plus the fold-state tag (see BiasTileTable)."""
    return BiasTileTable(
        bias_tiles_for(rel_embed, n_tiles, block, num_buckets, max_distance,
                       dtype=dtype, exp_base2=exp_base2),
        block, exp_base2)


def _unwrap_tiles(bias_tiles, block, exp_base2):
    """Verify a BiasTileTable's fold state against the call's kwargs and
    return the raw array; pass plain arrays through."""
    if isinstance(bias_tiles, BiasTileTable):
        assert bias_tiles.block == block and bias_tiles.exp_base2 == exp_base2, (
            f"bias tile table built for (block={bias_tiles.block}, "
            f"exp_base2={bias_tiles.exp_base2}) passed to a call with "
            f"(block={block}, exp_base2={exp_base2})")
        return bias_tiles.tiles
    return bias_tiles


def _flash_kernel(q_ref, k_ref, v_ref, bias_ref,
                  out_ref, m_ref, l_ref, acc_ref, *, n_k, hd, bb, hb,
                  precision, exp_base2):
    """q/k arrive AUGMENTED with two extra feature columns (wrapper):

      q[..., hd] = per-(b,h,t) gru_rel_pos gate   k[..., hd]   = 0
      q[..., hd+1] = 1                            k[..., hd+1] = key mask
                                                    (0 valid, NEG/scale pad)

    so ONE MXU dot yields scores-with-key-mask (the 1 x mask column), the
    gate column contributes 0 to the dot and is read back with a static
    lane slice. This sidesteps Mosaic's restrictions on 1-wide / dynamic
    sublane loads and lets gate+mask ride the same DMA as q/k.

    Blocks are PACKED over (bb batch rows, hb heads): one grid step loops
    bb*hb (batch, head) pairs in-kernel over the same resident tiles, so
    the shared bias tile is DMA'd once per bb*hb score tiles (not once
    each, as a (B, H, qi, kj) grid would), and the grid shrinks by the
    same factor — per-step overhead was what held the first version of
    this kernel to ~7% MXU. The QK^T and PV dots run in the INPUT dtype
    (f32 accumulate), so a bf16 call uses the MXU's native bf16 path
    instead of casting everything up to f32.

    ``exp_base2``: compute softmax in the base-2 domain — log2(e) is
    folded into the score scale and the (host-built) bias tiles, so
    ``exp2(s2 - m2)`` replaces ``exp(s - m)`` and the transcendental's
    internal x*log2e multiply disappears from the per-element hot path.
    Algebraically identical; float deviation is one extra rounding of the
    folded constants (~1e-7 relative on scores).

    Measured (v5e, B=8 T=2999 wavlm-large shapes, hard-sync barriers —
    earlier numbers taken through block_until_ready were invalid, see
    bench_flash_tune.py): the per-head fori_loop version ran 21.3-28.9 ms
    standalone across every (block, hb, exp_base2) config — ~4.6 us per
    (head, tile-pair) iteration against ~0.2 us of MXU work, i.e.
    loop-carried latency. The batched form lands 17.3-18.0 ms standalone;
    in-model (the number that counts — the encoder amortizes the tile
    table over 24 layers) block=512/hb=8 wins: 356 ms per 24-layer
    long8 call vs 407 ms before the rewrite. The residual is VPU exp
    throughput over [blk, blk] scores (exp_base2 measured slower, so the
    transcendental itself is the floor, not its base conversion).
    Packing bb>1 batch rows buys nothing further (bias DMA is already
    amortized over the packed heads) and costs VMEM that the larger
    block spends better, so batch_block defaults to 1."""
    kj = pl.program_id(3)

    @pl.when(kj == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    for b in range(bb):  # static unroll; bb defaults to 1
        qa = q_ref[b]                                          # [hb, blk, hd+2]
        ka = k_ref[b]                                          # [hb, blk, hd+2]
        v = v_ref[b]                                           # [hb, blk, hd]
        gate = qa[:, :, hd:hd + 1].astype(jnp.float32)         # [hb, blk, 1]
        bias = bias_ref[0].astype(jnp.float32)                 # [hb, blk, blk]

        # ONE batched dot over all hb heads (batch dim 0): a per-head
        # fori_loop of [blk, hd+2] dots held this kernel to ~13 TF/s —
        # 4.6 us per (head, tile-pair) iteration against ~0.2 us of MXU
        # work, the rest loop-carried latency Mosaic can't pipeline. The
        # batched form gives Mosaic hb independent dots and ONE vectorized
        # softmax over [hb, blk, blk] to schedule.
        #
        # precision is pinned explicitly (not inherited from the global
        # jax_default_matmul_precision): a global "highest" would request
        # fp32 contract precision on bf16 operands, which Mosaic rejects
        # at compile time. The production default is DEFAULT — the same
        # MXU passes the einsum path it replaces runs at. The 1/sqrt(hd)
        # score scale is folded into q by the wrapper (for hd=64 it is a
        # power of two, so the fold is exact even in bf16) — no per-score
        # VPU multiply here; the key-mask column rides the dot unscaled.
        s = jax.lax.dot_general(
            qa, ka, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=precision,
        )                                                      # mask included
        s = s + gate * bias

        m_prev = m_ref[b]                                      # [hb, blk, 1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        # the bf16 cast is fused into the exp's output write (no separate
        # f32->bf16 pass over [hb, blk, blk]); the row-sum for the softmax
        # normalizer rides the PV dot through v's appended ones column
        # (wrapper), moving a full VPU reduce pass onto the MXU — the
        # f32-accumulated dot sums the same bf16-rounded p the PV product
        # consumes. This kernel is VPU-bound on [blk, blk] passes (sweep:
        # e2/hb/block moves <35%, MXU ~0.7 us of a 7.7 us step), so pass
        # count is the lever.
        if exp_base2:
            p = jnp.exp2(s - m_new).astype(v.dtype)
            alpha = jnp.exp2(m_prev - m_new)
        else:
            p = jnp.exp(s - m_new).astype(v.dtype)
            alpha = jnp.exp(m_prev - m_new)
        pv = jax.lax.dot_general(
            p, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=precision,
        )                                                      # [hb, blk, hd+1]
        l_ref[b] = l_ref[b] * alpha + pv[:, :, hd:hd + 1]
        acc_ref[b] = acc_ref[b] * alpha + pv[:, :, :hd]
        m_ref[b] = m_new

    @pl.when(kj == n_k - 1)
    def _():
        out_ref[:] = (acc_ref[:] / l_ref[:]).astype(out_ref.dtype)


def flash_gated_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    gate: jnp.ndarray,
    rel_embed: jnp.ndarray,
    kvalid=None,
    bias_tiles=None,
    *,
    num_buckets: int,
    max_distance: int,
    block: int = 128,
    batch_block: int | None = None,
    head_block: int | None = None,
    exp_base2: bool = False,
    precision: jax.lax.Precision = jax.lax.Precision.DEFAULT,
    interpret: bool = False,
) -> jnp.ndarray:
    """WavLM gated-rel-pos-bias attention, O(T) HBM.

    Args:
      q, k, v: [B, T, H, hd].
      gate: [B, H, T] — the gru_rel_pos gate (gate_a*(gate_b*c-1)+2).
      rel_embed: [num_buckets, H] shared bias embedding.
      kvalid: optional [B, T] bool/float key validity (True/1 = attend).
      bias_tiles: optional precomputed tile table from ``bias_tiles_for``
        (must match this T's tile count and ``block``). The table is
        layer-independent — WavLM shares one rel_embed across its 24
        layers — so the encoder builds it once and threads it through the
        layer carry instead of paying the bucket-log construction (and a
        ~50 MB tile write at T=3000) per layer.
      head_block: heads packed per grid step (None = all H). Smaller
        values shrink the in-kernel fori_loop and multiply the grid's
        parallel steps — more double-buffering overlap at the cost of
        re-DMA'ing q/k/v tiles per head group (the bias tile stream
        scales the same either way: (1, hb, blk, blk) slices).
      exp_base2: softmax in the base-2 domain (see _flash_kernel).
      precision: MXU contract precision for the in-kernel dots. DEFAULT
        (the production setting) matches the einsum path's default-
        precision numerics; pass HIGHEST with f32 inputs for f32-exact
        parity checks (HIGHEST + bf16 inputs is rejected by Mosaic).
    Returns [B, T, H, hd] (same dtype as q).
    """
    bias_tiles = _unwrap_tiles(bias_tiles, block, exp_base2)
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
    # batch-pack factor: bb batch rows share each grid step (and its bias
    # tile DMA). The double-buffered VMEM footprint scales with
    # bb * H * block * itemsize; vmem_limit_bytes below raises Mosaic's
    # default 16 MB scoped limit so block=512 (bf16) / 256 (f32) fits.
    # Padded batch rows are masked rows and get sliced off below.
    if batch_block is None:
        batch_block = 1
    bb = min(B, batch_block)
    Bp = ((B + bb - 1) // bb) * bb
    if Bp != B:
        padb = [(0, Bp - B)]
        q = jnp.pad(q, padb + [(0, 0)] * 3)
        k = jnp.pad(k, padb + [(0, 0)] * 3)
        v = jnp.pad(v, padb + [(0, 0)] * 3)
        gate = jnp.pad(gate, padb + [(0, 0), (0, 0)])
        kvalid = jnp.pad(kvalid, padb + [(0, 0)])
    # fold the score scale (and, in base-2 mode, log2(e)) into q on the
    # host: one pass over [B, T, H, hd] replaces a per-grid-step VPU
    # multiply over every [blk, blk] score tile. For hd=64 the 1/8 scale
    # is a power of two — exact in bf16; the log2(e) factor adds one
    # rounding, matching the fold already applied to the bias tiles.
    eff_scale = scale * (math.log2(math.e) if exp_base2 else 1.0)
    qt = jnp.transpose(q, (0, 2, 1, 3)) * jnp.asarray(eff_scale, q.dtype)
    kt = jnp.transpose(k, (0, 2, 1, 3))
    vt = jnp.transpose(v, (0, 2, 1, 3))
    # augmentation columns (see _flash_kernel docstring)
    gate_col = gate.astype(qt.dtype)[..., None]                # [Bp, H, Tp, 1]
    ones_col = jnp.ones_like(gate_col)
    qa = jnp.concatenate([qt, gate_col, ones_col], axis=-1)
    zeros_col = jnp.zeros_like(gate_col)
    mask_col = jnp.where(kvalid > 0, 0.0, NEG).astype(qt.dtype)
    mask_col = jnp.broadcast_to(mask_col[:, None, :, None], (Bp, H, Tp, 1))
    ka = jnp.concatenate([kt, zeros_col, mask_col], axis=-1)
    # ones column: the PV dot's last output column is then the row-sum of
    # p — the softmax normalizer — so the kernel needs no VPU sum pass
    va = jnp.concatenate([vt, jnp.ones_like(vt[..., :1])], axis=-1)
    tile_dtype = jnp.bfloat16 if qt.dtype == jnp.bfloat16 else jnp.float32
    if bias_tiles is None:
        # bf16 tiles halve the dominant DMA stream; the gate*bias term is
        # computed in f32 either way, so this only rounds the bias operand
        # — well under the bf16 path's own score rounding
        tiles = bias_tiles_for(rel_embed, n, block, num_buckets,
                               max_distance, dtype=tile_dtype,
                               exp_base2=exp_base2)
    else:
        # caller-built tables must already be kernel-ready (same block /
        # dtype / exp_base2 fold — the encoder builds them via
        # bias_tiles_for once and carries them across all 24 layers)
        tiles = bias_tiles
        assert tiles.shape == (2 * n - 1, H, block, block), (
            tiles.shape, (2 * n - 1, H, block, block))
        if tiles.dtype != tile_dtype:
            tiles = tiles.astype(tile_dtype)

    hb = H if head_block is None else min(head_block, H)
    while H % hb:  # largest divisor of H <= head_block (H=12 & hb=8 -> 6)
        hb -= 1
    grid = (Bp // bb, H // hb, n, n)
    kernel = functools.partial(_flash_kernel, n_k=n, hd=hd,
                               bb=bb, hb=hb, precision=precision,
                               exp_base2=exp_base2)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bb, hb, block, hd + 2),
                         lambda g, hj, qi, kj: (g, hj, qi, 0)),
            pl.BlockSpec((bb, hb, block, hd + 2),
                         lambda g, hj, qi, kj: (g, hj, kj, 0)),
            pl.BlockSpec((bb, hb, block, hd + 1),
                         lambda g, hj, qi, kj: (g, hj, kj, 0)),
            pl.BlockSpec(
                (1, hb, block, block),
                lambda g, hj, qi, kj, _n=n: (kj - qi + _n - 1, hj, 0, 0),
            ),
        ],
        out_specs=pl.BlockSpec(
            (bb, hb, block, hd), lambda g, hj, qi, kj: (g, hj, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((Bp, H, Tp, hd), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bb, hb, block, 1), jnp.float32),
            pltpu.VMEM((bb, hb, block, 1), jnp.float32),
            pltpu.VMEM((bb, hb, block, hd), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(qa, ka, va, tiles)

    out = jnp.transpose(out, (0, 2, 1, 3))                     # [Bp, Tp, H, hd]
    return out[:B, :T]


# --------------------------------------------------------------------------
# Trainable wrapper: custom_vjp with an O(T*chunk)-memory backward
# --------------------------------------------------------------------------
#
# The Pallas kernel above is forward-only (WavLM *extraction* is frozen
# inference). Fine-tuning WavLM additionally needs gradients without
# re-materializing [B, H, T, T]. The backward here is a lax.scan over query
# chunks — standard flash-attention-2 backward math plus the two extra
# terms this attention has:
#
#   s = (q @ k^T) * scale + gate[b,h,t] * bias[h,t,s]          (+ key mask)
#   dgate[b,h,t]      = sum_s dS[t,s] * bias[t,s]
#   d_rel_embed[b', h] = sum over all (b,t,s) with bucket(s-t)==b' of
#                        dS[t,s] * gate[b,h,t]   (scatter-add per chunk)
#
# Each chunk re-derives its softmax rows exactly (full key axis in one
# [B, H, chunk, T] tile), so gradients are exact, memory is linear in T,
# and XLA keeps every contraction on the MXU. Pallas buys nothing extra
# here: the bucket scatter-add dominates layout choices and maps cleanly
# onto XLA's scatter, not onto Mosaic.


def _gathered_bias(rel_embed, qpos, T, num_buckets, max_distance):
    """bias[H, c, T] for query rows at absolute positions qpos."""
    rel = jnp.arange(T)[None, :] - qpos[:, None]               # k - q
    buckets = bucket_from_rel(rel, num_buckets, max_distance)  # [c, T]
    return jnp.transpose(jnp.take(rel_embed, buckets, axis=0), (2, 0, 1))


def _flash_bwd_scan(q, k, v, gate, rel_embed, kvalid, out, dout,
                    num_buckets, max_distance, chunk):
    B, T, H, hd = q.shape
    scale = 1.0 / math.sqrt(hd)
    Tp = ((T + chunk - 1) // chunk) * chunk
    padt = [(0, 0), (0, Tp - T)]
    qp = jnp.pad(q, padt + [(0, 0), (0, 0)]).astype(jnp.float32)
    outp = jnp.pad(out, padt + [(0, 0), (0, 0)]).astype(jnp.float32)
    # zero pad rows of dout => pad chunks contribute nothing to dk/dv/d_rel
    doutp = jnp.pad(dout, padt + [(0, 0), (0, 0)]).astype(jnp.float32)
    gatep = jnp.pad(gate, [(0, 0), (0, 0), (0, Tp - T)]).astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    keymask = jnp.where(kvalid > 0, 0.0, NEG)[:, None, None, :]  # [B,1,1,T]

    n_chunks = Tp // chunk
    qs = qp.reshape(B, n_chunks, chunk, H, hd).transpose(1, 0, 2, 3, 4)
    outs = outp.reshape(B, n_chunks, chunk, H, hd).transpose(1, 0, 2, 3, 4)
    douts = doutp.reshape(B, n_chunks, chunk, H, hd).transpose(1, 0, 2, 3, 4)
    gates = gatep.reshape(B, H, n_chunks, chunk).transpose(2, 0, 1, 3)

    def step(carry, xs):
        dk, dv, drel, ci = carry
        q_c, out_c, dout_c, gate_c = xs                        # [B,c,H,hd] ...
        qpos = ci * chunk + jnp.arange(chunk)
        bias_c = _gathered_bias(rel_embed.astype(jnp.float32), qpos, T,
                                num_buckets, max_distance)      # [H,c,T]
        s = jnp.einsum("bthd,bshd->bhts", q_c, kf) * scale
        s = s + gate_c[..., None] * bias_c[None] + keymask
        p = jax.nn.softmax(s, axis=-1)                          # [B,H,c,T]
        dP = jnp.einsum("bthd,bshd->bhts", dout_c, vf)
        Dsum = jnp.einsum("bthd,bthd->bht", dout_c, out_c)      # [B,H,c]
        dS = p * (dP - Dsum[..., None])
        dq_c = jnp.einsum("bhts,bshd->bthd", dS, kf) * scale
        dk = dk + jnp.einsum("bhts,bthd->bshd", dS, q_c) * scale
        dv = dv + jnp.einsum("bhts,bthd->bshd", p, dout_c)
        dgate_c = jnp.einsum("bhts,hts->bht", dS, bias_c)
        dSg = jnp.einsum("bhts,bht->tsh", dS, gate_c)           # [c,T,H]
        rel = jnp.arange(T)[None, :] - qpos[:, None]
        buckets = bucket_from_rel(rel, num_buckets, max_distance)
        drel = drel.at[buckets].add(dSg)
        return (dk, dv, drel, ci + 1), (dq_c, dgate_c)

    zeros_kv = jnp.zeros((B, T, H, hd), jnp.float32)
    drel0 = jnp.zeros_like(rel_embed, dtype=jnp.float32)
    (dk, dv, drel, _), (dqs, dgates) = jax.lax.scan(
        step, (zeros_kv, zeros_kv, drel0, jnp.int32(0)),
        (qs, outs, douts, gates))
    dq = dqs.transpose(1, 0, 2, 3, 4).reshape(B, Tp, H, hd)[:, :T]
    dgate = dgates.transpose(1, 2, 0, 3).reshape(B, H, Tp)[:, :, :T]
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            dgate.astype(gate.dtype), drel.astype(rel_embed.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4, 5, 6))
def _flash_trainable(num_buckets, max_distance, block, chunk, interpret,
                     head_block, exp_base2,
                     q, k, v, gate, rel_embed, kvalid, bias_tiles):
    return flash_gated_attention(
        q, k, v, gate, rel_embed, kvalid, bias_tiles,
        num_buckets=num_buckets, max_distance=max_distance,
        block=block, head_block=head_block, exp_base2=exp_base2,
        interpret=interpret)


def _flash_trainable_fwd(num_buckets, max_distance, block, chunk, interpret,
                         head_block, exp_base2,
                         q, k, v, gate, rel_embed, kvalid, bias_tiles):
    out = _flash_trainable(num_buckets, max_distance, block, chunk, interpret,
                           head_block, exp_base2,
                           q, k, v, gate, rel_embed, kvalid, bias_tiles)
    return out, (q, k, v, gate, rel_embed, kvalid, bias_tiles, out)


def _flash_trainable_bwd(num_buckets, max_distance, block, chunk, interpret,
                         head_block, exp_base2,
                         res, dout):
    q, k, v, gate, rel_embed, kvalid, bias_tiles, out = res
    dq, dk, dv, dgate, drel = _flash_bwd_scan(
        q, k, v, gate, rel_embed, kvalid, out, dout,
        num_buckets, max_distance, chunk)
    # bias_tiles is a pure function of rel_embed; the scatter-add in
    # _flash_bwd_scan already yields the FULL d_rel_embed, so the tiles
    # argument carries a zero cotangent (it is a forward-only cache)
    return (dq, dk, dv, dgate, drel, jnp.zeros_like(kvalid),
            jnp.zeros_like(bias_tiles))


_flash_trainable.defvjp(_flash_trainable_fwd, _flash_trainable_bwd)


def flash_gated_attention_trainable(
    q, k, v, gate, rel_embed, kvalid=None, bias_tiles=None, *,
    num_buckets, max_distance, block: int = 128, chunk: int = 128,
    head_block: int | None = None, exp_base2: bool = False,
    interpret: bool = False,
):
    """flash_gated_attention with exact gradients (see module comment).
    Forward cost is identical to the kernel path; the custom backward only
    runs under differentiation. ``bias_tiles`` must be consistent with
    ``rel_embed`` AND with (block, dtype, exp_base2) when given (the
    encoder builds them kernel-ready via ``bias_tiles_for`` once and
    shares them across layers). The backward recomputes softmax from
    ``rel_embed`` directly, so head_block/exp_base2 only shape the
    forward kernel."""
    bias_tiles = _unwrap_tiles(bias_tiles, block, exp_base2)
    if kvalid is None:
        kvalid = jnp.ones(q.shape[:2], jnp.float32)
    if bias_tiles is None:
        T = q.shape[1]
        n = (T + block - 1) // block
        tile_dtype = jnp.bfloat16 if q.dtype == jnp.bfloat16 else jnp.float32
        bias_tiles = bias_tiles_for(rel_embed, n, block,
                                    num_buckets, max_distance,
                                    dtype=tile_dtype, exp_base2=exp_base2)
    return _flash_trainable(num_buckets, max_distance, block, chunk,
                            interpret, head_block, exp_base2,
                            q, k, v, gate,
                            rel_embed, kvalid.astype(jnp.float32),
                            bias_tiles)
