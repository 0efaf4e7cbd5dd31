"""Fused multi-query cross attention (Pallas TPU kernel).

Fuses the Cross_Attention chain (reference
wengnet_mosei_mult_views_text_missing.py:79-95) for Q queries (Q=7 in the
live model) over a frame sequence:

    k      = tanh(x @ Wk + bk)               # [T, D]
    s      = scale * (k @ q^T)               # [T, Q]
    attn   = softmax(s over t < t_max)
    out[q] = sum_t attn[t, q] * x[t]         # [Q, D]

The query projection (q = query @ Wq + bq, a [B, Q, D] matmul with Q=7) is
done by the caller in XLA — it is tiny and fusing it buys nothing. The grid
blocks over (batch-block, time-block): the key projection runs as one
[block_b*block_t, D] @ [D, D] MXU matmul, scores are laid out
[block_b*Qp, block_t] (lane = time tile) with per-(batch, query)
online-softmax statistics. Backward recomputes via the einsum formulation
(ops/cross_attention.py) under custom_vjp.

All dots run at Precision.HIGHEST — the fusion net requires true-f32 for
checkpoint parity (see ModelConfig.matmul_precision).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -0.7 * 3.4e38
HIGHEST = jax.lax.Precision.HIGHEST


def _cross_kernel(tmax_ref, q_ref, x_ref, w_ref, b_ref, out_ref,
                  m_ref, l_ref, acc_ref, *,
                  scale: float, block_b: int, block_t: int, qp: int):
    j = pl.program_id(1)
    nt = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    d = x_ref.shape[-1]
    x = x_ref[...].reshape(block_b * block_t, d)        # [bb*bt, D]
    k = jnp.tanh(
        jax.lax.dot_general(
            x, w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=HIGHEST,
        )
        + b_ref[0]
    ).reshape(block_b, block_t, d)
    q = q_ref[...]                                       # [bb, Qp, D]
    # s[b, q, t] = scale * q[b, q] . k[b, t]
    s = scale * jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=HIGHEST,
    )                                                    # [bb, Qp, bt]
    s = s.reshape(block_b * qp, block_t)
    t_ids = j * block_t + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(t_ids < tmax_ref[0], s, NEG)

    m_prev = m_ref[:, 0:1]                               # [bb*Qp, 1]
    l_prev = l_ref[:, 0:1]
    m_curr = jnp.max(s, axis=1, keepdims=True)
    m_next = jnp.maximum(m_prev, m_curr)
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(s - m_next)                              # [bb*Qp, bt]
    l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
    m_ref[...] = jnp.broadcast_to(m_next, m_ref.shape)
    l_ref[...] = jnp.broadcast_to(l_next, l_ref.shape)
    # acc[b, q] += sum_t p[b, q, t] * x[b, t]
    pv = jax.lax.dot_general(
        p.reshape(block_b, qp, block_t),
        x.reshape(block_b, block_t, d),
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=HIGHEST,
    )                                                    # [bb, Qp, D]
    acc_ref[...] = (
        alpha.reshape(block_b, qp, 1) * acc_ref[...] + pv
    )

    @pl.when(j == nt - 1)
    def _store():
        out_ref[...] = (
            acc_ref[...] / l_ref[:, 0:1].reshape(block_b, qp, 1)
        ).astype(out_ref.dtype)


def _use_interpret() -> bool:
    # compiled Mosaic kernels need a real TPU; CPU (tests) runs interpreted
    return jax.default_backend() != "tpu"


def _cross_forward(q, x, k_kernel, k_bias, t_max, *, softmax_scale, block_t,
                   block_b: int = 8):
    B, Q, D = q.shape
    _, T, _ = x.shape
    block_t = min(block_t, T)
    block_b = min(block_b, B)
    while B % block_b:
        block_b //= 2
    # VMEM bound: the kernel holds ~3 [bb, bt, D] f32 tiles (x, k, and the
    # dot temporaries) plus the [D, D] weight; above D=256 the default
    # 8x256 tile overflows the ~16 MB VMEM and Mosaic dies. Shrink the
    # time tile (then the batch tile) to keep each tile group <= ~4 MB.
    budget = 1 << 20  # f32 elements per [bb*bt, D] tile
    while block_b * block_t * D > budget and block_t > 8 and T % (block_t // 2) == 0:
        block_t //= 2
    while block_b * block_t * D > budget and block_b > 1:
        block_b //= 2
    assert T % block_t == 0, (T, block_t)
    Qp = max(8, -(-Q // 8) * 8)                        # pad queries to sublane multiple
    if Qp != Q:
        q = jnp.concatenate([q, jnp.zeros((B, Qp - Q, D), q.dtype)], axis=1)
    tmax_arr = jnp.full((1,), T if t_max is None else t_max, jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // block_b, T // block_t),
        in_specs=[
            pl.BlockSpec((block_b, Qp, D), lambda i, j, *_: (i, 0, 0)),
            pl.BlockSpec((block_b, block_t, D), lambda i, j, *_: (i, j, 0)),
            pl.BlockSpec((D, D), lambda i, j, *_: (0, 0)),
            pl.BlockSpec((1, D), lambda i, j, *_: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_b, Qp, D), lambda i, j, *_: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((block_b * Qp, 128), jnp.float32),
            pltpu.VMEM((block_b * Qp, 128), jnp.float32),
            pltpu.VMEM((block_b, Qp, D), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_cross_kernel, scale=softmax_scale,
                          block_b=block_b, block_t=block_t, qp=Qp),
        out_shape=jax.ShapeDtypeStruct((B, Qp, D), x.dtype),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=_use_interpret(),
    )(tmax_arr, q, x, k_kernel, k_bias.reshape(1, D))
    return out[:, :Q]


@functools.partial(jax.custom_vjp, nondiff_argnames=("softmax_scale", "block_t"))
def fused_cross_attention(q, x, k_kernel, k_bias, t_max=None,
                          softmax_scale: float = 0.3, block_t: int = 256):
    """out [B, Q, D]: each projected query attends over x's time axis.

    `q` must already be query-projected (q = query @ Wq + bq); this fuses
    the key projection + tanh + scores + masked softmax + weighted sum.
    """
    return _cross_forward(q, x, k_kernel, k_bias, t_max,
                          softmax_scale=softmax_scale, block_t=block_t)


def _fwd(q, x, k_kernel, k_bias, t_max, softmax_scale, block_t):
    out = _cross_forward(q, x, k_kernel, k_bias, t_max,
                         softmax_scale=softmax_scale, block_t=block_t)
    return out, (q, x, k_kernel, k_bias, t_max)


def _bwd(softmax_scale, block_t, res, g):
    from sdumc_tpu.ops.masking import mask_time_scores

    q, x, k_kernel, k_bias, t_max = res

    def ref(q, x, k_kernel, k_bias):
        k = jnp.tanh(x @ k_kernel + k_bias)
        scores = jnp.einsum("btd,bqd->btq", k, q)
        scores = mask_time_scores(softmax_scale * scores, t_max, axis=1)
        attn = jax.nn.softmax(scores, axis=1)
        return jnp.einsum("btd,btq->bqd", x, attn)

    _, vjp = jax.vjp(ref, q, x, k_kernel, k_bias)
    dq, dx, dk, db = vjp(g)
    return dq, dx, dk, db, None


fused_cross_attention.defvjp(_fwd, _bwd)
