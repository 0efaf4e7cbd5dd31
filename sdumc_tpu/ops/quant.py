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

int4 was tried and RETIRED (rounds 2-4): group-128 4-bit weights with a
Pallas fused-unpack matmul got the weight stream down to 4 bits/weight,
but measured on v5e it never beat int8 at any matched gen_batch — final
nail: with the int8 KV cache removing the next bottleneck, w8a8+int8KV
reaches 218.5 clip-tok/s at gen_batch=8 while int4+int8KV manages 144.7
(bench_extractors.json r4): the per-step nibble-unpack/group-scale VPU
work costs more than the halved weight bytes save once weights are no
longer the binding stream. Per VERDICT r3 item 3, the flag is deleted
(git history has the kernel: ops/pallas/int4_matmul.py before this
commit).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

def quantize_kernel(w: jnp.ndarray):
    """Symmetric per-output-channel int8: w [..., in, out] -> (q, scale)."""
    absmax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=-2)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale[..., None, :]),
                 -127, 127).astype(jnp.int8)
    return q, scale


def dequantize_kernel(q: jnp.ndarray, scale: jnp.ndarray, dtype=jnp.bfloat16):
    return (q.astype(jnp.float32) * scale[..., None, :]).astype(dtype)


def quantize_params(params: Dict[str, Any], min_ndim: int = 2,
                    mode: str = "int8") -> Dict[str, Any]:
    """Convert a (converted-from-torch or randomly initialized) LLaMA param
    tree into the layout ``QuantDense`` expects: every ``kernel`` leaf of a
    bias-free Dense becomes ``kernel_q`` (int8) + ``kernel_scale`` (f32).

    Embeddings (``embedding``) and norm scales pass through unchanged —
    gathers don't stream the whole table per step, and norms are tiny.
    Runs leaf-by-leaf under jit so a 13.5 GB tree never needs 2x HBM.

    ``mode``: "int8" / "w8a8" share the same int8 per-channel storage
    (w8a8 changes the compute path, not the checkpoint layout).
    """
    assert mode in ("int8", "w8a8"), mode
    quant_one = jax.jit(quantize_kernel)

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
    (A ``bits=4`` nibble-packed mode existed through round 4 and was
    retired after losing to int8 at every matched batch — see the module
    docstring.)"""

    features: int
    dtype: Any = jnp.bfloat16
    act_quant: bool = False

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
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
