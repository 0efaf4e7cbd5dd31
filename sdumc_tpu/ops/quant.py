"""Weight-only int8 quantization for the decode-bound extractor graphs.

Why: autoregressive feat4 decode streams the FULL weight set from HBM every
step (measured 478 GB/s at 7B bf16, 58% of v5e peak — bench_extractors.json),
so tokens/s is capped by weight bytes, not FLOPs. Symmetric per-output-channel
int8 halves those bytes: the matmul reads int8 from HBM, dequantizes in
VMEM (XLA fuses the convert+scale into the dot), and accumulates in the
model dtype. The reference runs the same 7B in fp16 with no quantized path
(extract_wavlm_vicuna.py:192-196 loads fp16 and shards via dispatch_model).

Opt-in (``LlamaConfig(quant="int8")`` / ``--quant int8`` on the extractor
CLI): numerics change — per-channel symmetric int8 on LLM weights measures
~1% relative error on hidden taps (test_quant.py pins the tolerance). The
checkpoint-exact default stays bf16/f32.

Scheme:  w[..., in, out]  ->  q = round(w / s) in int8,
         s[..., out] = max|w| over the `in` axis / 127   (f32)
Stacked scan-over-layers kernels [L, in, out] quantize per (layer, channel).

int4 (``quant="int4"``) halves the weight stream AGAIN: 4-bit symmetric
quantization with GROUP-WISE scales (one f32 scale per 128 input channels
per output channel — per-channel-only int4 loses too much; groups are the
standard accuracy fix, cf. GPTQ/AWQ). Storage is two nibbles packed per
int8 byte along the `in` axis (NOT jnp.int4: on jax 0.9 an int4 array
cannot be passed as a jit argument on the TPU backend — the shard_arg
path recurses), so a 7B weight set drops to ~3.5 GB (+3% for the scales).
The in-kernel unpack is two shifts that XLA fuses into the dot operand
read; the matmul splits per group so the scale applies on the tiny
[rows, out] partial, never a materialized dequantized weight matrix;
partials accumulate in f32.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp

INT4_GROUP = 128  # input channels per scale group (GPTQ/AWQ convention)


def _group_size(in_features: int, group: int = INT4_GROUP) -> int:
    """Largest usable group: `group` when it divides `in`, else one group
    spanning the whole `in` axis (tiny test configs)."""
    return group if in_features % group == 0 else in_features


def quantize_kernel(w: jnp.ndarray):
    """Symmetric per-output-channel int8: w [..., in, out] -> (q, scale)."""
    absmax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=-2)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale[..., None, :]),
                 -127, 127).astype(jnp.int8)
    return q, scale


def dequantize_kernel(q: jnp.ndarray, scale: jnp.ndarray, dtype=jnp.bfloat16):
    return (q.astype(jnp.float32) * scale[..., None, :]).astype(dtype)


def pack_int4(q: jnp.ndarray) -> jnp.ndarray:
    """Pack int8-valued nibbles in [-7, 7] pairwise along axis -2:
    q [..., in, out] -> int8 [..., in//2, out], byte = (q[2i+1]<<4)|(q[2i]&0xF)."""
    *lead, n_in, n_out = q.shape
    assert n_in % 2 == 0, n_in
    pairs = q.astype(jnp.int8).reshape(*lead, n_in // 2, 2, n_out)
    lo, hi = pairs[..., 0, :], pairs[..., 1, :]
    return ((hi << 4) | (lo & 0xF)).astype(jnp.int8)


def unpack_int4(packed: jnp.ndarray) -> jnp.ndarray:
    """int8 [..., in//2, out] -> sign-extended nibbles int8 [..., in, out].
    Two arithmetic shifts per byte — XLA fuses them into the consumer."""
    *lead, half, n_out = packed.shape
    lo = (packed << 4) >> 4          # arithmetic >> sign-extends the nibble
    hi = packed >> 4
    pairs = jnp.stack([lo, hi], axis=-2)  # [..., in//2, 2, out]
    return pairs.reshape(*lead, 2 * half, n_out)


def quantize_kernel_int4(w: jnp.ndarray, group: int = INT4_GROUP):
    """Symmetric group-wise int4: w [..., in, out] ->
    (packed int8 [..., in//2, out], scale f32 [..., in//g, out])."""
    *lead, n_in, n_out = w.shape
    g = _group_size(n_in, group)
    wf = w.astype(jnp.float32).reshape(*lead, n_in // g, g, n_out)
    absmax = jnp.max(jnp.abs(wf), axis=-2)            # [..., K, out]
    scale = jnp.maximum(absmax, 1e-8) / 7.0
    q = jnp.clip(jnp.round(wf / scale[..., None, :]), -7, 7)
    return pack_int4(q.reshape(*lead, n_in, n_out)), scale


def dequantize_kernel_int4(packed: jnp.ndarray, scale: jnp.ndarray,
                           dtype=jnp.float32):
    q = unpack_int4(packed)
    *lead, n_in, n_out = q.shape
    k = scale.shape[-2]
    qf = q.astype(jnp.float32).reshape(*lead, k, n_in // k, n_out)
    return (qf * scale[..., None, :]).reshape(*lead, n_in, n_out).astype(dtype)


def quantize_params(params: Dict[str, Any], min_ndim: int = 2,
                    mode: str = "int8") -> Dict[str, Any]:
    """Convert a (converted-from-torch or randomly initialized) LLaMA param
    tree into the layout ``QuantDense`` expects: every ``kernel`` leaf of a
    bias-free Dense becomes ``kernel_q`` (int8) + ``kernel_scale`` (f32).

    Embeddings (``embedding``) and norm scales pass through unchanged —
    gathers don't stream the whole table per step, and norms are tiny.
    Runs leaf-by-leaf under jit so a 13.5 GB tree never needs 2x HBM.

    ``mode``: "int8" / "w8a8" share int8 per-channel storage; "int4"
    stores jnp.int4 nibbles with group-wise scales (INT4_GROUP).
    """
    fn = (quantize_kernel if mode in ("int8", "w8a8")
          else functools.partial(quantize_kernel_int4, group=INT4_GROUP))
    assert mode in ("int8", "w8a8", "int4"), mode
    quant_one = jax.jit(fn)

    def walk(node):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if (k == "kernel" and hasattr(v, "ndim") and v.ndim >= min_ndim
                        and "bias" not in node):
                    q, s = quant_one(v)
                    out["kernel_q"], out["kernel_scale"] = q, s
                else:
                    out[k] = walk(v)
            return out
        return node

    return walk(params)


import flax.linen as nn  # noqa: E402  (after jax — flax import is heavier)


class QuantDense(nn.Module):
    """Bias-free Dense over int8 weights + per-channel f32 scales.

    Param tree: ``kernel_q`` [in, features] int8, ``kernel_scale``
    [features] f32 — produced by :func:`quantize_params` from a regular
    Dense ``kernel``.

    Two compute modes:

    * ``act_quant=False`` (weight-only, the ``quant="int8"`` default):
      the matmul runs in ``dtype`` — the int8 operand is converted
      in-fusion, HBM traffic stays int8, and the channel scale is
      applied to the [.., features] result. The conversion itself is
      VPU work proportional to the weight count (at 7B decode ~7e9
      converts per step), which weight-stream-bound decode pays on its
      critical path.
    * ``act_quant=True`` (``quant="w8a8"``): activations are quantized
      per-row (dynamic symmetric int8 — rows are tokens, tiny next to
      the weights) and the dot runs NATIVE int8 x int8 -> int32 on the
      MXU (2x the bf16 rate on v5e, zero dequant VPU work); the result
      is rescaled by act_scale x kernel_scale. Numerics shift further
      than weight-only (~1-2% on hidden taps, test_quant.py pins it) —
      opt-in for the decode-bound extractor graphs.
    * ``bits=4`` (``quant="int4"``, weight-only): nibble-packed int8
      [in/2, features] + group-wise scales [in/128, features]. The unpack
      (two shifts) fuses into the dot operand read, so HBM streams 4 bits
      per weight; the dot splits per group (einsum with the group axis
      batched) so the f32 scale lands on the small [rows, K, out] partial
      — the full dequantized [in, out] matrix is never materialized.
      Partials accumulate in f32."""

    features: int
    dtype: Any = jnp.bfloat16
    act_quant: bool = False
    bits: int = 8
    group: int = INT4_GROUP

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        if self.bits == 4:
            assert not self.act_quant, "w4a8 not supported"
            g = _group_size(in_features, self.group)
            k = in_features // g
            wq = self.param("kernel_q", nn.initializers.zeros,
                            (in_features // 2, self.features), jnp.int8)
            scale = self.param("kernel_scale", nn.initializers.ones,
                               (k, self.features), jnp.float32)
            if jax.default_backend() == "tpu":
                # Pallas kernel: packed bytes DMA'd once, nibble unpack on
                # the VPU in VMEM — the only form where HBM traffic stays
                # at 4 bits/weight (every XLA formulation materializes the
                # unpacked tensor; ops/pallas/int4_matmul.py header).
                from sdumc_tpu.ops.pallas.int4_matmul import int4_matmul
                return int4_matmul(x, wq, scale).astype(self.dtype)
            # bitcast int8 -> int4[..., 2] INSIDE the program (int4 cannot
            # cross a jit boundary on TPU in jax 0.9) and contract over the
            # nibble axis too: bitcast index 0 IS the low nibble = input
            # 2p, so x aligns by pure reshape and XLA's native int4
            # convert fuses into the dot — measured 71 MB vs 482 MB
            # "bytes accessed" for the shift-unpack form of the same dense.
            w4 = jax.lax.bitcast_convert_type(wq, jnp.int4)
            xr = x.astype(self.dtype).reshape(*x.shape[:-1], k, g // 2, 2)
            wr = w4.reshape(k, g // 2, self.features, 2).astype(self.dtype)
            partial = jnp.einsum("...kpj,kpoj->...ko", xr, wr,
                                 preferred_element_type=jnp.float32)
            return jnp.einsum("...ko,ko->...o", partial,
                              scale).astype(self.dtype)
        assert self.bits == 8, self.bits
        wq = self.param("kernel_q", nn.initializers.zeros,
                        (in_features, self.features), jnp.int8)
        scale = self.param("kernel_scale", nn.initializers.ones,
                           (self.features,), jnp.float32)
        if self.act_quant:
            absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1,
                             keepdims=True)
            x_scale = jnp.maximum(absmax, 1e-8) / 127.0      # [.., 1] f32
            xq = jnp.clip(jnp.round(x.astype(jnp.float32) / x_scale),
                          -127, 127).astype(jnp.int8)
            acc = jax.lax.dot_general(
                xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            y = acc.astype(jnp.float32) * x_scale * scale
            return y.astype(self.dtype)
        y = jax.lax.dot_general(
            x.astype(self.dtype), wq.astype(self.dtype),
            (((x.ndim - 1,), (0,)), ((), ())))
        return y * scale.astype(self.dtype)
