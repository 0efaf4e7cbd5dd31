"""Pallas int4 weight-only matmul: nibble unpack fused in VMEM.

Why a kernel: XLA cannot keep an int4->wider convert inside a dot's
operand fusion — every formulation tried (grouped einsum, scale-on-weight
single dot, int4->int8 native dot; scripts/bench_int4_forms.py) compiles
to a MATERIALIZED unpacked weight tensor in HBM, so the "4-bit" path
streams int8-sized traffic plus the packed bytes and loses to plain int8
(measured r2: 76 tok/s int4 vs 121 int8 at 7B decode). Decode is
weight-stream-bound; the only way int4 wins is to keep HBM traffic at 4
bits/weight and unpack on the VPU after the DMA. That is exactly what
this kernel does:

  grid step j owns a [IN/2, oblk] tile of packed bytes (one DMA at 4
  bits/weight). A fori_loop over scale groups sign-extends each 64-row
  packed chunk into lo/hi nibble planes, multiplies by that group's
  [1, oblk] scale, and stores into a [IN, oblk] bf16 VMEM scratch laid
  out as [lo-plane; hi-plane]. One MXU dot x' @ scratch then yields the
  output tile, where x' = concat(x[:, 0::2], x[:, 1::2]) (host-side
  shuffle) matches the split-plane row order.

Packing convention matches ops/quant.py pack_int4: byte = (q[2i+1]<<4) |
(q[2i]&0xF), group scales [IN/g, OUT] f32 over the *input* axis.
Numerics: the group scale is applied in bf16 on the weight operand
(vs f32 on the partial in the XLA path) — an extra ~0.4% rounding on top
of int4's own ~7% grid, pinned by tests/test_quant.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, wp_ref, s_ref, out_ref, wun_ref, *, n_groups, g2, half):
    def body(k, _):
        chunk = wp_ref[pl.ds(k * g2, g2)]                    # [g2, oblk] int8
        sk = s_ref[pl.ds(k, 1)].astype(jnp.bfloat16)         # [1, oblk]
        # Shift-free nibble split: Mosaic's v5e target has no vector-i8
        # shifts, adds, or compares — only bitwise ops and the i8->float
        # convert. So stay in the supported set: AND keeps each nibble,
        # XOR 8 rotates the low nibble's sign bit so a bf16 subtract of 8
        # finishes the sign extension after the convert, and the high
        # nibble converts as 16*hi directly (sign already in place), so
        # folding /16 into its scale copy makes the dequant multiply free.
        lo = ((chunk & jnp.int8(15)) ^ jnp.int8(8)).astype(jnp.bfloat16)
        lo = (lo - jnp.bfloat16(8.0)) * sk
        hi = (chunk & jnp.int8(-16)).astype(jnp.bfloat16) * (
            sk * jnp.bfloat16(1.0 / 16.0))
        wun_ref[pl.ds(k * g2, g2)] = lo
        wun_ref[pl.ds(half + k * g2, g2)] = hi
        return 0

    jax.lax.fori_loop(0, n_groups, body, 0)
    out_ref[:] = jax.lax.dot_general(
        x_ref[:], wun_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(out_ref.dtype)


def int4_matmul(x: jnp.ndarray, packed: jnp.ndarray, scale: jnp.ndarray,
                *, out_block: int = 512, interpret: bool = False
                ) -> jnp.ndarray:
    """x [..., IN] @ dequant(packed [IN/2, OUT], scale [K, OUT]) -> [..., OUT].

    Output dtype bfloat16 (f32 MXU accumulation). Row/output-tile padding
    is handled here; IN must match 2*packed rows and divide into the
    scale groups evenly.
    """
    *lead, n_in = x.shape
    half, n_out = packed.shape
    assert n_in == 2 * half, (x.shape, packed.shape)
    k_groups = scale.shape[0]
    assert scale.shape == (k_groups, n_out), scale.shape
    assert half % k_groups == 0, (half, k_groups)
    g2 = half // k_groups
    assert g2 % 8 == 0 or k_groups == 1, (
        f"group/2={g2} must be sublane-aligned")

    rows = 1
    for d in lead:
        rows *= d
    xf = x.reshape(rows, n_in).astype(jnp.bfloat16)
    # split-plane shuffle: row r<half reads input 2r (lo nibble), row
    # half+r reads input 2r+1 (hi nibble)
    xs = jnp.concatenate([xf[:, 0::2], xf[:, 1::2]], axis=-1)
    rp = max(8, ((rows + 7) // 8) * 8)
    if rp != rows:
        xs = jnp.pad(xs, ((0, rp - rows), (0, 0)))
    op = ((n_out + out_block - 1) // out_block) * out_block
    if op != n_out:
        packed = jnp.pad(packed, ((0, 0), (0, op - n_out)))
        scale = jnp.pad(scale, ((0, 0), (0, op - n_out)))

    kernel = functools.partial(_kernel, n_groups=k_groups, g2=g2, half=half)
    out = pl.pallas_call(
        kernel,
        grid=(op // out_block,),
        in_specs=[
            pl.BlockSpec((rp, n_in), lambda j: (0, 0)),
            pl.BlockSpec((half, out_block), lambda j: (0, j)),
            pl.BlockSpec((k_groups, out_block), lambda j: (0, j)),
        ],
        out_specs=pl.BlockSpec((rp, out_block), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((rp, op), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((n_in, out_block), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xs, packed, scale)
    return out[:rows, :n_out].reshape(*lead, n_out)
