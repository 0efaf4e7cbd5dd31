"""Shared Flax building blocks with torch-compatible initialization.

The reference model is pure torch ``nn.Linear`` stacks; to make training
dynamics comparable we reproduce torch's default init: both kernel and bias
~ U(-1/sqrt(fan_in), 1/sqrt(fan_in)) (torch kaiming_uniform(a=sqrt(5)) on
the kernel reduces to exactly that bound).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    # flax Dense kernel shape is [fan_in, fan_out]
    fan_in = shape[0]
    bound = 1.0 / jnp.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_linear_bias_init_for(fan_in: int):
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / jnp.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class Linear(nn.Module):
    """nn.Dense with torch-default init and explicit matmul precision.

    precision defaults to HIGHEST (true f32): JAX's backend default matmul
    runs a low-precision fast path (bf16 passes on the TPU MXU and even on
    the CPU backend) that breaks checkpoint-exact parity with the reference.

    ``dtype`` is the COMPUTE dtype (params are stored f32 regardless —
    flax casts them per-matmul): bf16 halves the HBM bytes of every
    frame-level activation, the dominant stream of the fusion net's train
    step (profiles/step_ops.md: 76% of device time in elementwise/reduce
    fusions over f32[2B, T, 256]). A non-f32 dtype drops the HIGHEST
    precision request — three-pass bf16x3 emulation would re-inflate the
    cost the cast is buying back.
    """

    features: int
    precision: str = "highest"
    dtype: object = None  # None = promote (f32 params -> f32 compute)

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        low = self.dtype is not None and jnp.dtype(self.dtype).itemsize < 4
        return nn.Dense(
            self.features,
            kernel_init=torch_linear_kernel_init,
            bias_init=torch_linear_bias_init_for(fan_in),
            dtype=self.dtype,
            precision=jax.lax.Precision(self.precision)
            if self.precision != "default" and not low
            else None,
            name="dense",
        )(x)


class _DenseParams(nn.Module):
    """Declares (kernel, bias) with the exact param tree of `Linear` (a
    child scope named "dense") without applying the matmul — used where a
    fused Pallas kernel consumes the parameters directly."""

    features: int

    @nn.compact
    def __call__(self, fan_in: int):
        kernel = self.param(
            "kernel", torch_linear_kernel_init, (fan_in, self.features)
        )
        bias = self.param(
            "bias", torch_linear_bias_init_for(fan_in), (self.features,)
        )
        return kernel, bias


class LinearParams(nn.Module):
    """Param-tree twin of `Linear`: same "<name>/dense/{kernel,bias}" paths,
    but returns the parameters instead of computing x @ W + b."""

    features: int

    @nn.compact
    def __call__(self, fan_in: int):
        return _DenseParams(self.features, name="dense")(fan_in)


class FrameDropout(nn.Module):
    """HBM-lean dropout for the big ``[B, T, d]`` frame streams.

    ``nn.Dropout`` draws u32 bits per element and thresholds a float
    uniform: at [2B=256, T=512, d=256] the TPU materializes a 134 MB u32
    tensor plus a 33 MB pred mask per dropout call (profiles/
    train_hlo_top.md — the two audio-stream dropouts alone were ~0.5 GB of
    mask traffic per train step). Here the mask is drawn as raw u8 bits
    (rng-bit-generator emits ui8 directly — 4x fewer bytes) and the
    threshold compare fuses into the multiply; the backward re-reads the
    same 1-byte bits.

    The drop probability is quantized to k/256. The live rate — the
    reference's hardcoded 0.5 frame/attention dropout (FRA2UTT_new /
    Cross_Attention) — is exactly representable (k=128); the kept-path
    scale uses the exact realized keep probability ``1 - k/256`` so the
    expectation is unbiased at any rate. Small tensors keep ``nn.Dropout``
    (same stream, float-exact rates)."""

    rate: float

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        if deterministic or self.rate == 0.0:
            return x
        thresh = int(round(self.rate * 256))
        if thresh <= 0:
            return x
        keep_p = 1.0 - thresh / 256.0
        bits = jax.random.bits(self.make_rng("dropout"), x.shape, jnp.uint8)
        scaled = x * jnp.asarray(1.0 / keep_p, x.dtype)
        return jnp.where(bits >= thresh, scaled, jnp.zeros_like(scaled))


class MLP(nn.Module):
    """[Linear -> ReLU -> Dropout] stack (reference `MLP`,
    wengnet_mosei_mult_views_text_missing.py:264-273)."""

    layer_dims: Sequence[int]
    dropout: float = 0.3

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        for i, dim in enumerate(self.layer_dims):
            x = Linear(dim, name=f"linear_{i}")(x)
            x = nn.relu(x)
            x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return x
