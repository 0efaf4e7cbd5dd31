"""LLaMA-family decoder (Vicuna-7B-v1.5) — the text-embedding and
pseudo-text engine of the pipeline.

Reference uses of the torch/HF model:

* gt-text features: embed transcript tokens, one forward, hidden-state tap
  (layer -3 / -4..-1 summed) — extract_wavlm_vicuna_hd.py:235-252,
  extract_text_embedding_huggingface.py:145.
* feat4 pseudo-text: WavLM-projected embeddings + prompt -> ``generate``
  (beam 4, <=200 new tokens) harvesting the last-4-layer hidden states of
  the leading beam at every step — extract_wavlm_vicuna.py:245-264.

TPU-native design: bf16 weights, full-sequence forward is one jit; decoding
is a ``lax.while_loop`` over a static-shape KV cache (no dynamic shapes), so
the whole beam-search generate compiles to a single XLA program instead of
the reference's per-step python loop. Tensor parallelism shards attention
heads and MLP hidden over the mesh's ``model`` axis via logical param
annotations (parallel/sharding.py applies the rules); 7B runs replicated on
one v5e chip in bf16 (13.5 GB) or sharded on 4+.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: Optional[int] = None   # None -> MHA (Vicuna-7B)
    rope_theta: float = 10000.0
    rms_eps: float = 1e-5
    max_position_embeddings: int = 4096
    dtype: Any = jnp.bfloat16
    # lax.scan over layers instead of a python unroll: the compiled HLO
    # shrinks ~num_layers-fold (one layer body compiled once) — at 7B the
    # unrolled beam-decode program is large enough to kill slow/limited
    # compilers, and scan is how production JAX LLMs ship. Param layout
    # changes: one "layers" subtree with a leading [num_layers] axis on
    # every leaf (convert.hf_llama stacks; parallel.sharding understands
    # the stacked paths). Numerics identical to the unroll (test_llama).
    scan_layers: bool = False
    # "int8" = weight-only quantized Dense kernels (ops/quant.py): decode
    # is weight-stream-bound, so halving weight bytes ~doubles tokens/s.
    # "w8a8" additionally quantizes activations per-row and runs native
    # int8 x int8 MXU dots — no per-step dequant VPU work (at 7B decode
    # the weight-only path converts ~7e9 int8 weights per step on the
    # VPU). Opt-in fast paths — numerics shift ~1% (int8) / ~1-2% (w8a8)
    # (test_quant.py); params come from ops.quant.quantize_params over a
    # bf16 tree (same tree for both modes). Embeddings stay full
    # precision (gathers don't stream the table). An int4 mode existed
    # through round 4 and was retired: it lost to int8 at every matched
    # gen_batch even with the KV cache quantized (ops/quant.py docstring
    # has the measurements).
    quant: Optional[str] = None
    # "int8" = quantized KV cache with per-(token, head) symmetric scales.
    # Decode attention streams the whole cache every step (2.95 GB at 7B
    # beam-4 gen_batch=8 — the largest stream after the weights once those
    # are w8a8), so halving cache bytes attacks the next bound directly.
    # The CURRENT chunk's keys/values stay exact (quantization applies on
    # the cache write; the joint softmax mixes exact-new with dequantized-
    # old). Composes with any `quant` mode. Numeric shift on decode taps
    # measures ~0.1-1% (test_quant.py pins it).
    kv_quant: Optional[str] = None

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def kv_heads(self) -> int:
        return self.num_kv_heads or self.num_heads

    @staticmethod
    def tiny(**kw) -> "LlamaConfig":
        base = dict(vocab_size=128, hidden_size=64, intermediate_size=128,
                    num_layers=3, num_heads=4, max_position_embeddings=256,
                    dtype=jnp.float32)
        base.update(kw)
        return LlamaConfig(**base)


class RMSNorm(nn.Module):
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
        y = x.astype(jnp.float32) * jax.lax.rsqrt(var + self.eps)
        return (y * scale).astype(x.dtype)


def rope(x: jnp.ndarray, positions: jnp.ndarray, theta: float) -> jnp.ndarray:
    """Rotary embedding, HF-Llama convention (half-split, not interleaved).

    x: [B, T, H, hd]; positions: [B, T] absolute positions.
    """
    hd = x.shape[-1]
    inv_freq = 1.0 / (theta ** (jnp.arange(0, hd, 2, dtype=jnp.float32) / hd))
    angles = positions[..., None].astype(jnp.float32) * inv_freq  # [B, T, hd/2]
    cos = jnp.cos(angles)[:, :, None, :]
    sin = jnp.sin(angles)[:, :, None, :]
    x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.astype(x.dtype)


def quantize_kv(x: jnp.ndarray):
    """Symmetric per-(token, head) int8 over the head_dim axis:
    x [..., hd] -> (int8 [..., hd], f32 scale [...]). head_dim is the only
    axis a cache slot owns exclusively, so scales never mix tokens."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale[..., None]),
                 -127, 127).astype(jnp.int8)
    return q, scale


def _cached_attention(c: LlamaConfig, q, k_new, v_new, k_old, v_old, idx, mask,
                      k_scale=None, v_scale=None):
    """Attention over the PRE-UPDATE cache plus the current chunk, one joint
    softmax — numerically identical to update-then-attend while keeping the
    cache buffer a pure read (the update happens outside, so XLA never has
    to copy the multi-GB stack to resolve a read-after-write on the scan
    carry; measured ~15 ms of the 38 ms 7B int8 decode forward at 32 rows,
    scripts/bench_decode_fwd.py ablation).

    q [B,T,H,hd]; k_new/v_new [B,T,KV,hd] (rope'd current chunk);
    k_old/v_old [B,S,KV,hd] cache buffer whose slots >= ``idx`` are stale;
    mask [B,1,T,S] additive over cache slots AS IF the chunk were already
    written at [idx, idx+T) — the chunk's own mask is the [idx, idx+T)
    column slice, so caller semantics (left-pad buckets, _slot_mask offsets)
    transfer exactly. Returns [B,T,H,hd].

    k_scale/v_scale [B,S,KV] (kv_quant="int8"): k_old/v_old hold int8 codes;
    the per-slot scale is folded OUTSIDE the head_dim reduction (scores *=
    k_scale after the dot; v_scale folds into the probs), so no dequantized
    [B,S,H,hd] copy is ever materialized — the attention stream stays at
    int8 bytes, which is the whole point.
    """
    B, T = q.shape[:2]
    S = k_old.shape[1]
    if c.kv_heads != c.num_heads:
        rep = c.num_heads // c.kv_heads
        k_new = jnp.repeat(k_new, rep, axis=2)
        v_new = jnp.repeat(v_new, rep, axis=2)
        k_old = jnp.repeat(k_old, rep, axis=2)
        v_old = jnp.repeat(v_old, rep, axis=2)
        if k_scale is not None:
            k_scale = jnp.repeat(k_scale, rep, axis=2)
            v_scale = jnp.repeat(v_scale, rep, axis=2)
    scale = jnp.sqrt(c.head_dim).astype(jnp.float32)
    mask = jnp.broadcast_to(mask, (B, 1, T, S))
    # stale slots (>= idx) hold garbage in the pre-update buffer; the live
    # chunk supplies those keys instead via the sliced mask columns
    stale = jnp.arange(S)[None, None, None, :] >= idx
    old_mask = jnp.where(stale, -1e30, mask)
    chunk_mask = jax.lax.dynamic_slice(mask, (0, 0, 0, idx), (B, 1, T, T))

    if T == 1:
        # decode step: the einsum form lowers to B*H batched [1, hd] x
        # [hd, S] dots — 1-row MXU passes whose per-pass overhead dominates
        # (measured ~2 ms per extra beam row at 7B). The multiply-reduce
        # form runs on the VPU and fuses into the K/V cache stream, which
        # decode attention is bound by anyway.
        s_old = jnp.sum(
            q.astype(jnp.float32) * k_old.astype(jnp.float32), axis=-1
        )                                                   # [B, S, H]
        if k_scale is not None:
            s_old = s_old * k_scale                         # dequant, [B,S,H]
        s_old = jnp.transpose(s_old, (0, 2, 1))[:, :, None, :] / scale
        s_self = jnp.sum(
            q.astype(jnp.float32) * k_new.astype(jnp.float32), axis=-1
        )                                                   # [B, 1, H]
        s_self = jnp.transpose(s_self, (0, 2, 1))[:, :, None, :] / scale
        joint = jnp.concatenate(
            [s_old + old_mask, s_self + chunk_mask], axis=-1)
        probs = jax.nn.softmax(joint, axis=-1)              # [B, H, 1, S+1]
        pv = jnp.transpose(probs[:, :, 0, :S], (0, 2, 1))   # [B, S, H]
        if v_scale is not None:
            pv = pv * v_scale                               # fold dequant
        out = jnp.sum(pv[..., None] * v_old.astype(jnp.float32), axis=1)
        out = out + probs[:, :, 0, S:] * v_new[:, 0].astype(jnp.float32)
        return out.astype(c.dtype)[:, None]                 # [B, 1, H, hd]

    k_old_d = k_old if k_scale is None else k_old.astype(c.dtype)
    s_old = jnp.einsum("bthd,bshd->bhts", q, k_old_d).astype(jnp.float32)
    if k_scale is not None:
        s_old = s_old * jnp.transpose(k_scale, (0, 2, 1))[:, :, None, :]
    s_new = jnp.einsum("bthd,bshd->bhts", q, k_new).astype(jnp.float32)
    joint = jnp.concatenate(
        [s_old / scale + old_mask, s_new / scale + chunk_mask], axis=-1)
    probs = jax.nn.softmax(joint, axis=-1).astype(c.dtype)  # [B, H, T, S+T]
    p_old = probs[..., :S]
    if v_scale is not None:
        # fold the value dequant into the probs (tiny [B,H,T,S] multiply)
        p_old = (probs[..., :S].astype(jnp.float32)
                 * jnp.transpose(v_scale, (0, 2, 1))[:, :, None, :]
                 ).astype(c.dtype)
    out = jnp.einsum("bhts,bshd->bthd", p_old,
                     v_old if v_scale is None else v_old.astype(c.dtype))
    out = out + jnp.einsum("bhts,bshd->bthd", probs[..., S:], v_new)
    return out


def _split_attention(c: LlamaConfig, q, k_new, v_new, pk, pv, gk, gv, gidx,
                     pmask, pk_scale=None, pv_scale=None,
                     gk_scale=None, gv_scale=None):
    """Decode attention over a PROMPT-SHARED + per-beam GENERATED split KV
    cache (T == 1 only — the beam-decode hot loop).

    The monolithic [rows, P+G] cache forced every stream to scale with
    rows = C*B: the prompt region was stored AND re-read B times per clip
    even though all beams of a clip share it bit-for-bit (generation.py
    prefills once per clip then broadcast-copied), and the beam-ancestry
    reorder gathered the whole cache although only generated slots can
    ever differ between beams. Splitting prompt [C, P] / generated
    [C*B, G] cuts, at 7B beam-4 gen_batch=8 int8-KV: cache memory
    1.52 -> 0.67 GB, per-step attention reads 1.48 -> 0.67 GB, and the
    reorder gather 3.0 -> 0.8 GB/step — and the freed HBM is what lets
    gen_batch=16/32 fit one v5e chip (scripts/bench_extractors.py).

    q/k_new/v_new: [R, 1, (KV-)H, hd] current step (R = C*B rows,
    clip-major). pk/pv: [C, P, KV, hd] prompt cache; gk/gv: [R, G, KV, hd]
    generated cache whose slots >= ``gidx`` are stale. pmask: [C, P]
    additive prompt mask (left-pad slots -> -1e30) — static across steps.
    *_scale: int8-KV per-slot scales ([C, P, KV] / [R, G, KV]), folded
    outside the head_dim reductions exactly as in _cached_attention.
    Returns [R, 1, H, hd].
    """
    R = q.shape[0]
    C, P = pk.shape[0], pk.shape[1]
    G = gk.shape[1]
    B = R // C
    if c.kv_heads != c.num_heads:
        rep = c.num_heads // c.kv_heads
        k_new = jnp.repeat(k_new, rep, axis=2)
        v_new = jnp.repeat(v_new, rep, axis=2)
        pk = jnp.repeat(pk, rep, axis=2)
        pv = jnp.repeat(pv, rep, axis=2)
        gk = jnp.repeat(gk, rep, axis=2)
        gv = jnp.repeat(gv, rep, axis=2)
        if pk_scale is not None:
            pk_scale = jnp.repeat(pk_scale, rep, axis=2)
            pv_scale = jnp.repeat(pv_scale, rep, axis=2)
            gk_scale = jnp.repeat(gk_scale, rep, axis=2)
            gv_scale = jnp.repeat(gv_scale, rep, axis=2)
    H, hd = c.num_heads, c.head_dim
    scale = jnp.sqrt(hd).astype(jnp.float32)
    qf = q[:, 0].astype(jnp.float32)                        # [R, H, hd]

    # ---- prompt scores: group rows by clip so the [C, P, H, hd] prompt
    # cache streams from HBM ONCE, not once per beam (the whole point of
    # the split). (c, h) are batch dims of a [B, hd] x [hd, P] dot.
    qc = qf.reshape(C, B, H, hd)
    s_p = jnp.einsum("cbhd,cphd->cbhp", qc, pk.astype(jnp.float32))
    if pk_scale is not None:
        s_p = s_p * jnp.transpose(pk_scale, (0, 2, 1))[:, None]  # [C,1,H,P]
    s_p = s_p / scale + pmask[:, None, None, :]             # [C, B, H, P]
    s_p = s_p.reshape(R, H, P)

    # ---- generated scores: per-row multiply-reduce (VPU) — fuses into the
    # gk stream, same rationale as _cached_attention's T==1 branch
    s_g = jnp.sum(qf[:, None] * gk.astype(jnp.float32), axis=-1)  # [R, G, H]
    if gk_scale is not None:
        s_g = s_g * gk_scale
    s_g = jnp.transpose(s_g, (0, 2, 1)) / scale             # [R, H, G]
    stale = jnp.arange(G)[None, None, :] >= gidx
    s_g = jnp.where(stale, -1e30, s_g)

    s_self = jnp.sum(qf * k_new[:, 0].astype(jnp.float32), axis=-1)
    s_self = s_self[:, :, None] / scale                     # [R, H, 1]

    probs = jax.nn.softmax(
        jnp.concatenate([s_p, s_g, s_self], axis=-1), axis=-1)

    pp = probs[..., :P].reshape(C, B, H, P)
    if pv_scale is not None:
        pp = pp * jnp.transpose(pv_scale, (0, 2, 1))[:, None]
    out = jnp.einsum("cbhp,cphd->cbhd", pp,
                     pv.astype(jnp.float32)).reshape(R, H, hd)
    pg = jnp.transpose(probs[..., P:P + G], (0, 2, 1))      # [R, G, H]
    if gv_scale is not None:
        pg = pg * gv_scale
    out = out + jnp.sum(pg[..., None] * gv.astype(jnp.float32), axis=1)
    out = out + probs[..., P + G:] * v_new[:, 0].astype(jnp.float32)
    return out.astype(c.dtype)[:, None]                     # [R, 1, H, hd]


def _dense(features, name, dtype, quant=None):
    if quant in ("int8", "w8a8"):
        from sdumc_tpu.ops.quant import QuantDense

        return QuantDense(features, dtype=dtype, name=name,
                          act_quant=quant == "w8a8")
    assert quant is None, quant
    return nn.Dense(features, use_bias=False, dtype=dtype, name=name,
                    kernel_init=nn.initializers.normal(0.02))


class LlamaAttention(nn.Module):
    cfg: LlamaConfig

    @nn.compact
    def __call__(self, x, positions, mask, cache=None, layer_idx=None):
        """x: [B, T, D]; mask: [B, 1, T, S] additive; cache: optional dict
        with k/v [B, S_max, H, hd] and index — returns (out, new_cache).

        Stacked-cache mode (scan trunk): ``cache["k"]`` is the FULL
        [L, B, S_max, H, hd] stack and ``layer_idx`` the traced layer
        number. The stack is READ-ONLY here: attention runs jointly over
        the old stack and the current chunk (_cached_attention), the new
        (k, v) chunk is returned for LlamaModel's single post-scan slab
        write. Returns (out, (k, v))."""
        c = self.cfg
        B, T, _ = x.shape
        q = _dense(c.num_heads * c.head_dim, "q_proj", c.dtype, c.quant)(x)
        k = _dense(c.kv_heads * c.head_dim, "k_proj", c.dtype, c.quant)(x)
        v = _dense(c.kv_heads * c.head_dim, "v_proj", c.dtype, c.quant)(x)
        q = q.reshape(B, T, c.num_heads, c.head_dim)
        k = k.reshape(B, T, c.kv_heads, c.head_dim)
        v = v.reshape(B, T, c.kv_heads, c.head_dim)
        q = rope(q, positions, c.rope_theta)
        k = rope(k, positions, c.rope_theta)

        if cache is not None and "pk" in cache and layer_idx is not None:
            # stacked scan trunk over a SPLIT cache (see _split_attention):
            # pure reads here; the (k, v) chunk rides out of the scan and
            # LlamaModel writes it into the GEN cache only
            gidx = cache["index"][layer_idx]
            layer_of = lambda key: jax.lax.dynamic_index_in_dim(  # noqa: E731
                cache[key], layer_idx, 0, keepdims=False)
            out = _split_attention(
                c, q, k, v, layer_of("pk"), layer_of("pv"),
                layer_of("gk"), layer_of("gv"), gidx, mask,
                layer_of("pk_scale") if "pk_scale" in cache else None,
                layer_of("pv_scale") if "pv_scale" in cache else None,
                layer_of("gk_scale") if "gk_scale" in cache else None,
                layer_of("gv_scale") if "gv_scale" in cache else None)
            out = out.reshape(B, T, c.num_heads * c.head_dim)
            return (_dense(c.hidden_size, "o_proj", c.dtype, c.quant)(out),
                    (k, v))
        if cache is not None and "pk" in cache:
            # unrolled per-layer split cache: attend, then append the chunk
            # into the gen cache (the prompt part is never written)
            gidx = cache["index"]
            out = _split_attention(
                c, q, k, v, cache["pk"], cache["pv"],
                cache["gk"], cache["gv"], gidx, mask,
                cache.get("pk_scale"), cache.get("pv_scale"),
                cache.get("gk_scale"), cache.get("gv_scale"))
            new_cache = dict(cache)
            if "gk_scale" in cache:
                k_w, k_s = quantize_kv(k)
                v_w, v_s = quantize_kv(v)
                new_cache.update(
                    gk=jax.lax.dynamic_update_slice(
                        cache["gk"], k_w, (0, gidx, 0, 0)),
                    gv=jax.lax.dynamic_update_slice(
                        cache["gv"], v_w, (0, gidx, 0, 0)),
                    gk_scale=jax.lax.dynamic_update_slice(
                        cache["gk_scale"], k_s, (0, gidx, 0)),
                    gv_scale=jax.lax.dynamic_update_slice(
                        cache["gv_scale"], v_s, (0, gidx, 0)),
                    index=gidx + T)
            else:
                new_cache.update(
                    gk=jax.lax.dynamic_update_slice(
                        cache["gk"], k.astype(cache["gk"].dtype),
                        (0, gidx, 0, 0)),
                    gv=jax.lax.dynamic_update_slice(
                        cache["gv"], v.astype(cache["gv"].dtype),
                        (0, gidx, 0, 0)),
                    index=gidx + T)
            out = out.reshape(B, T, c.num_heads * c.head_dim)
            return (_dense(c.hidden_size, "o_proj", c.dtype, c.quant)(out),
                    new_cache)
        if cache is not None and cache["k"].ndim == 5:
            # Stacked scan trunk: the cache stack is READ-ONLY here. The
            # old design updated the scan-carried stack and read it back
            # in the same iteration; XLA's copy insertion resolves that
            # read-after-write by duplicating the whole [L, B, S, H, hd]
            # stack once per step — measured ~15 ms of the 38 ms 7B int8
            # decode forward at 32 rows (scripts/bench_decode_fwd.py
            # ablation; the slab write alone and the full read alone are
            # both in-place/bandwidth-fair, only their combination on one
            # buffer pays the copy). Attending over the OLD stack plus the
            # current chunk explicitly (one joint softmax over the same
            # logit set — numerically identical) makes the scan side pure
            # reads; the (k, v) slab rides out as a scan output and
            # LlamaModel does ONE in-place slab write after the scan.
            assert layer_idx is not None
            idx = cache["index"][layer_idx]
            layer_of = lambda key: jax.lax.dynamic_index_in_dim(  # noqa: E731
                cache[key], layer_idx, 0, keepdims=False)
            k_old, v_old = layer_of("k"), layer_of("v")
            ks = layer_of("k_scale") if "k_scale" in cache else None
            vs = layer_of("v_scale") if "v_scale" in cache else None
            out = _cached_attention(c, q, k, v, k_old, v_old, idx, mask,
                                    ks, vs)
            out = out.reshape(B, T, c.num_heads * c.head_dim)
            return (_dense(c.hidden_size, "o_proj", c.dtype, c.quant)(out),
                    (k, v))
        if cache is not None:
            # unrolled per-layer cache: same old+chunk attention (the read
            # targets the pre-update buffer, so the slab write below stays
            # in place), update applied here
            idx = cache["index"]
            out = _cached_attention(c, q, k, v, cache["k"], cache["v"],
                                    idx, mask, cache.get("k_scale"),
                                    cache.get("v_scale"))
            if "k_scale" in cache:
                k_w, k_s = quantize_kv(k)
                v_w, v_s = quantize_kv(v)
                new_cache = {
                    "k": jax.lax.dynamic_update_slice(
                        cache["k"], k_w, (0, idx, 0, 0)),
                    "v": jax.lax.dynamic_update_slice(
                        cache["v"], v_w, (0, idx, 0, 0)),
                    "k_scale": jax.lax.dynamic_update_slice(
                        cache["k_scale"], k_s, (0, idx, 0)),
                    "v_scale": jax.lax.dynamic_update_slice(
                        cache["v_scale"], v_s, (0, idx, 0)),
                    "index": idx + T,
                }
            else:
                new_cache = {
                    "k": jax.lax.dynamic_update_slice(
                        cache["k"], k.astype(cache["k"].dtype), (0, idx, 0, 0)),
                    "v": jax.lax.dynamic_update_slice(
                        cache["v"], v.astype(cache["v"].dtype), (0, idx, 0, 0)),
                    "index": idx + T,
                }
        else:
            new_cache = None
            k_use, v_use = k, v
            if c.kv_heads != c.num_heads:
                rep = c.num_heads // c.kv_heads
                k_use = jnp.repeat(k_use, rep, axis=2)
                v_use = jnp.repeat(v_use, rep, axis=2)
            scores = jnp.einsum("bthd,bshd->bhts", q, k_use).astype(jnp.float32)
            scores = scores / jnp.sqrt(c.head_dim).astype(jnp.float32)
            scores = scores + mask
            probs = jax.nn.softmax(scores, axis=-1).astype(c.dtype)
            out = jnp.einsum("bhts,bshd->bthd", probs, v_use)
        out = out.reshape(B, T, c.num_heads * c.head_dim)
        return _dense(c.hidden_size, "o_proj", c.dtype, c.quant)(out), new_cache


class LlamaMLP(nn.Module):
    cfg: LlamaConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        gate = _dense(c.intermediate_size, "gate_proj", c.dtype, c.quant)(x)
        up = _dense(c.intermediate_size, "up_proj", c.dtype, c.quant)(x)
        return _dense(c.hidden_size, "down_proj", c.dtype, c.quant)(nn.silu(gate) * up)


class LlamaLayer(nn.Module):
    cfg: LlamaConfig
    # scan mode: also emit this layer's hidden state as a scanned output
    # (the per-layer taps the feat4 extractor harvests)
    collect_hidden: bool = False
    # scan mode: per-layer coefficients for the RUNNING tap sum in the
    # carry (see LlamaModel tap_sum_layers) — static tuple, len num_layers
    collect_coeff: Optional[Tuple[float, ...]] = None

    @nn.compact
    def __call__(self, x, positions, mask, cache=None):
        """Unrolled mode: x [B, T, D], per-layer ``cache`` dict.
        Scan-carry mode (nn.scan trunk): x is the carry tuple
        ``(h, stacked_caches_or_None, layer_idx, tap_acc_or_None)`` — the
        stacked caches ride the CARRY as PURE READS (attention runs over
        the old stack plus the current chunk, see _cached_attention), the
        layer's (k, v) chunk rides OUT as a scanned output and LlamaModel
        does one in-place slab write after the scan; ``tap_acc``
        accumulates collect_coeff[li] * output. Scanned outputs are
        ``(hidden_or_(), kv_or_())``."""
        if isinstance(x, tuple):
            h, caches, li, tap = x
            out, kv = self._block(h, positions, mask, caches, li)
            if tap is not None:
                coeff = jnp.asarray(self.collect_coeff, jnp.float32)[li]
                tap = tap + coeff * out.astype(jnp.float32)
            return ((out, caches, li + 1, tap),
                    (out if self.collect_hidden else (),
                     kv if caches is not None else ()))
        out, new_cache = self._block(x, positions, mask, cache, None)
        return out, new_cache

    def _block(self, x, positions, mask, cache, layer_idx):
        h, new_cache = LlamaAttention(self.cfg, name="self_attn")(
            RMSNorm(self.cfg.rms_eps, name="input_layernorm")(x),
            positions, mask, cache, layer_idx)
        x = x + h
        x = x + LlamaMLP(self.cfg, name="mlp")(
            RMSNorm(self.cfg.rms_eps, name="post_attention_layernorm")(x))
        return x, new_cache


class LlamaModel(nn.Module):
    """Decoder trunk; returns final hidden + per-layer hidden taps."""

    cfg: LlamaConfig

    @nn.compact
    def __call__(
        self,
        input_ids: Optional[jnp.ndarray] = None,
        inputs_embeds: Optional[jnp.ndarray] = None,
        positions: Optional[jnp.ndarray] = None,
        attn_mask: Optional[jnp.ndarray] = None,
        caches: Optional[Tuple[Dict, ...]] = None,
        output_hidden_states: bool = False,
        tap_sum_layers: Optional[Tuple[int, ...]] = None,
    ):
        """``tap_sum_layers``: hidden-state indices (HF convention — the
        list is [embed, layer outputs...; last entry post-final-norm], so
        (-4, -3, -2, -1) is the reference's feat4 tap) whose SUM is
        returned as ``tap_sum`` [B, T, D] f32 without materializing the
        per-layer stack — decode wants only this sum, and stacking all
        num_layers states per step is pure HBM traffic. Equals
        ``sum(hidden_states[i] for i in tap_sum_layers)`` exactly
        (clamped the same way for shallow models)."""
        c = self.cfg
        embed = nn.Embed(c.vocab_size, c.hidden_size, dtype=c.dtype,
                         embedding_init=nn.initializers.normal(0.02),
                         name="embed_tokens")
        x = embed(input_ids) if inputs_embeds is None else inputs_embeds.astype(c.dtype)
        B, T, _ = x.shape
        if positions is None:
            positions = jnp.broadcast_to(jnp.arange(T)[None], (B, T))
        if attn_mask is None:
            # causal over the current segment (no cache)
            causal = jnp.tril(jnp.ones((T, T), bool))
            attn_mask = jnp.where(causal, 0.0, -1e30)[None, None]

        L = c.num_layers
        tap = None
        layer_coeff = None
        tap_final = 0.0
        if tap_sum_layers is not None:
            n_hs = L + 1
            idxs = {i % n_hs for i in tap_sum_layers if -n_hs <= i < n_hs}
            # hs[j] = embed (j=0) | layer j-1 output (1<=j<L) | post-norm
            # final (j=L) — the raw last-layer output never appears in hs
            layer_coeff = tuple(
                1.0 if (j + 1) in idxs and (j + 1) != n_hs - 1 else 0.0
                for j in range(L))
            tap_final = 1.0 if (n_hs - 1) in idxs else 0.0
            tap = (1.0 if 0 in idxs else 0.0) * x.astype(jnp.float32)

        hidden_states = [x] if output_hidden_states else None
        if c.scan_layers:
            # the stacked caches (and the optional running tap sum) ride
            # the scan CARRY as pure reads; each layer's (k, v) chunk is a
            # scanned OUTPUT and the whole [L, B, T, KV, hd] slab is
            # written into the cache in ONE in-place dynamic_update_slice
            # below — a carried read+write on the same buffer forces XLA's
            # copy-insertion to duplicate the stack every step (see
            # _cached_attention docstring for the measurement)
            Scan = nn.scan(
                LlamaLayer,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                in_axes=(nn.broadcast, nn.broadcast),
                out_axes=0,
                length=c.num_layers,
            )
            carry, ys = Scan(c, collect_hidden=output_hidden_states,
                             collect_coeff=layer_coeff,
                             name="layers")((x, caches, jnp.int32(0), tap),
                                            positions, attn_mask)
            x, _, _, tap = carry
            hs_stack, kv_stack = ys
            if output_hidden_states:
                hidden_states += [hs_stack[i] for i in range(c.num_layers)]
            if caches is not None and "pk" in caches:
                # split cache: append the [L, R, T, KV, hd] chunk slab into
                # the GEN cache only; the prompt part rides through untouched
                # (a pure carry read — XLA never copies it)
                k_new, v_new = kv_stack
                idx = caches["index"][0]
                if "gk_scale" in caches:
                    k_new, k_s = quantize_kv(k_new)
                    v_new, v_s = quantize_kv(v_new)
                    extra = {
                        "gk_scale": jax.lax.dynamic_update_slice(
                            caches["gk_scale"], k_s, (0, 0, idx, 0)),
                        "gv_scale": jax.lax.dynamic_update_slice(
                            caches["gv_scale"], v_s, (0, 0, idx, 0)),
                    }
                else:
                    extra = {}
                new_caches = {
                    **caches,
                    "gk": jax.lax.dynamic_update_slice(
                        caches["gk"], k_new.astype(caches["gk"].dtype),
                        (0, 0, idx, 0, 0)),
                    "gv": jax.lax.dynamic_update_slice(
                        caches["gv"], v_new.astype(caches["gv"].dtype),
                        (0, 0, idx, 0, 0)),
                    "index": caches["index"] + T,
                    **extra,
                }
            elif caches is not None:
                k_new, v_new = kv_stack        # [L, B, T, KV, hd] each
                idx = caches["index"][0]       # layers always advance together
                if "k_scale" in caches:
                    # quantize the whole [L, B, T, KV, hd] slab in one pass
                    # (chunks rode the scan out in bf16 — attention used
                    # them exact; only the persisted cache is int8)
                    k_new, k_s = quantize_kv(k_new)
                    v_new, v_s = quantize_kv(v_new)
                    extra = {
                        "k_scale": jax.lax.dynamic_update_slice(
                            caches["k_scale"], k_s, (0, 0, idx, 0)),
                        "v_scale": jax.lax.dynamic_update_slice(
                            caches["v_scale"], v_s, (0, 0, idx, 0)),
                    }
                else:
                    extra = {}
                new_caches = {
                    "k": jax.lax.dynamic_update_slice(
                        caches["k"], k_new.astype(caches["k"].dtype),
                        (0, 0, idx, 0, 0)),
                    "v": jax.lax.dynamic_update_slice(
                        caches["v"], v_new.astype(caches["v"].dtype),
                        (0, 0, idx, 0, 0)),
                    "index": caches["index"] + T,
                    **extra,
                }
            else:
                new_caches = None
        else:
            new_caches = [] if caches is not None else None
            for i in range(c.num_layers):
                cache_i = caches[i] if caches is not None else None
                x, nc = LlamaLayer(c, name=f"layers_{i}")(x, positions, attn_mask, cache_i)
                if caches is not None:
                    new_caches.append(nc)
                if output_hidden_states:
                    hidden_states.append(x)
                if tap is not None and layer_coeff[i]:
                    tap = tap + x.astype(jnp.float32)
            if new_caches is not None:
                new_caches = tuple(new_caches)
        x = RMSNorm(c.rms_eps, name="norm")(x)
        # HF convention: the LAST entry of hidden_states is post-final-norm
        if output_hidden_states:
            hidden_states[-1] = x
        if tap is not None and tap_final:
            tap = tap + x.astype(jnp.float32)
        return {
            "last_hidden_state": x,
            "hidden_states": tuple(hidden_states) if output_hidden_states else None,
            "tap_sum": tap,
            "caches": new_caches,
        }

    def embed_only(self, input_ids):
        """Token embeddings without running the trunk (reference
        ``embed_tokens`` access, extract_wavlm_vicuna.py:212-224)."""
        c = self.cfg
        embed = nn.Embed(c.vocab_size, c.hidden_size, dtype=c.dtype,
                         embedding_init=nn.initializers.normal(0.02),
                         name="embed_tokens")
        return embed(input_ids)


class LlamaForCausalLM(nn.Module):
    cfg: LlamaConfig

    @nn.compact
    def __call__(self, last_logit_only: bool = False, **kw):
        """``last_logit_only`` computes logits for the FINAL position only:
        decode prefill needs just the next-token distribution, and the full
        [B, T, vocab] f32 logits are ~2 GB at 7B/beam-4/T=128 — enough to
        OOM a 16 GB chip that already holds the weights."""
        out = LlamaModel(self.cfg, name="model")(**kw)
        h = out["last_hidden_state"]
        if last_logit_only:
            h = h[:, -1:]
        # matmul in the model dtype, result in f32: a f32-dtype Dense would
        # materialize a f32 COPY of the [D, vocab] kernel (524 MB at 7B —
        # the difference between fitting and OOMing one v5e chip); HF fp16
        # checkpoints likewise matmul in half precision
        logits = _dense(self.cfg.vocab_size, "lm_head", self.cfg.dtype,
                        self.cfg.quant)(h)
        out["logits"] = logits.astype(jnp.float32)
        return out


def init_cache(cfg: LlamaConfig, batch: int, max_len: int, dtype=None):
    quant = cfg.kv_quant == "int8"
    dtype = jnp.int8 if quant else (dtype or cfg.dtype)
    if cfg.scan_layers:
        # one stacked cache with a leading layer axis, scanned by the model
        L = cfg.num_layers
        cache = {
            "k": jnp.zeros((L, batch, max_len, cfg.kv_heads, cfg.head_dim), dtype),
            "v": jnp.zeros((L, batch, max_len, cfg.kv_heads, cfg.head_dim), dtype),
            "index": jnp.zeros((L,), jnp.int32),
        }
        if quant:
            cache["k_scale"] = jnp.zeros(
                (L, batch, max_len, cfg.kv_heads), jnp.float32)
            cache["v_scale"] = jnp.zeros(
                (L, batch, max_len, cfg.kv_heads), jnp.float32)
        return cache

    def one():
        cache = {
            "k": jnp.zeros((batch, max_len, cfg.kv_heads, cfg.head_dim), dtype),
            "v": jnp.zeros((batch, max_len, cfg.kv_heads, cfg.head_dim), dtype),
            "index": jnp.int32(0),
        }
        if quant:
            cache["k_scale"] = jnp.zeros(
                (batch, max_len, cfg.kv_heads), jnp.float32)
            cache["v_scale"] = jnp.zeros(
                (batch, max_len, cfg.kv_heads), jnp.float32)
        return cache

    return tuple(one() for _ in range(cfg.num_layers))


def split_cache_from_prefill(cfg: LlamaConfig, prefill_caches, beams: int,
                             gen_max: int):
    """Build the beam-decode SPLIT cache (see _split_attention) from a
    finished per-clip prefill: the prefill's [.., C, P, ..] buffers become
    the shared read-only prompt part verbatim (every beam of a clip shares
    its prompt bit-for-bit, so no per-beam copy is ever made — the old
    engine jnp.repeat'ed the full multi-GB prefill across beams), and a
    fresh [.., C*beams, gen_max, ..] generated part is allocated with its
    own write index starting at 0."""
    quant = cfg.kv_quant == "int8"
    dtype = jnp.int8 if quant else cfg.dtype

    def gen_part(C, scalar_index):
        R = C * beams
        g = {
            "gk": jnp.zeros((R, gen_max, cfg.kv_heads, cfg.head_dim), dtype),
            "gv": jnp.zeros((R, gen_max, cfg.kv_heads, cfg.head_dim), dtype),
        }
        if quant:
            g["gk_scale"] = jnp.zeros((R, gen_max, cfg.kv_heads), jnp.float32)
            g["gv_scale"] = jnp.zeros((R, gen_max, cfg.kv_heads), jnp.float32)
        return g

    if isinstance(prefill_caches, dict):   # stacked scan layout [L, C, ...]
        L, C = prefill_caches["k"].shape[:2]
        g = jax.tree_util.tree_map(
            lambda z: jnp.broadcast_to(z, (L,) + z.shape), gen_part(C, None))
        out = {"pk": prefill_caches["k"], "pv": prefill_caches["v"],
               "index": jnp.zeros((L,), jnp.int32), **g}
        if quant:
            out["pk_scale"] = prefill_caches["k_scale"]
            out["pv_scale"] = prefill_caches["v_scale"]
        return out
    out = []
    for c in prefill_caches:               # unrolled: tuple of per-layer
        C = c["k"].shape[0]
        layer = {"pk": c["k"], "pv": c["v"], "index": jnp.int32(0),
                 **gen_part(C, 0)}
        if quant:
            layer["pk_scale"] = c["k_scale"]
            layer["pv_scale"] = c["v_scale"]
        out.append(layer)
    return tuple(out)


def cache_mask(query_positions, max_len):
    """Additive mask [B, 1, T, max_len]: attend to cache slots <= position."""
    B, T = query_positions.shape
    slots = jnp.arange(max_len)[None, None, None, :]
    ok = slots <= query_positions[:, None, :, None]
    return jnp.where(ok, 0.0, -1e30)
