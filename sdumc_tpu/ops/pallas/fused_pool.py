"""Fused frame->utterance attention pooling (Pallas TPU kernel).

One kernel fuses the whole FRA2UTT chain (reference
wengnet_mosei_mult_views_text_missing.py:56-68):

    proj   = tanh(x @ W + b)            # [T, D] -> [T, D]
    s      = scale * (proj . context)   # [T]
    attn   = softmax(s over t < t_max)
    pooled = sum_t attn[t] * x[t]       # [D]

This is exactly the multi-query cross-attention kernel with a single query
equal to the learned context vector (scores = tanh(x@W+b) . q), so it
delegates to ops/pallas/fused_cross.py's kernel — which keeps every tensor
2-D inside the kernel (Mosaic rejects some 1-D vector layouts) and pads the
query axis to the 8-sublane minimum.

The backward pass recomputes through the einsum formulation
(ops/attention_pool.py) under jax.custom_vjp — same math, XLA-fused.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from sdumc_tpu.ops.attention_pool import attention_pool
from sdumc_tpu.ops.pallas.fused_cross import _cross_forward


def _pool_forward(x, kernel, bias, context, t_max, *, softmax_scale, block_t):
    B = x.shape[0]
    q = jnp.broadcast_to(context[None, None, :], (B, 1, context.shape[-1]))
    out = _cross_forward(
        q, x, kernel, bias, t_max, softmax_scale=softmax_scale, block_t=block_t
    )
    return out[:, 0]


@functools.partial(jax.custom_vjp, nondiff_argnames=("softmax_scale", "block_t"))
def fused_attention_pool(x, kernel, bias, context, t_max=None,
                         softmax_scale: float = 0.3, block_t: int = 256):
    """Pooled [B, D] = online-softmax attention pool of x [B, T, D].

    Numerically interchangeable with ops.attention_pool (tests pin them);
    t_max may be None, an int, or a traced scalar.
    """
    return _pool_forward(
        x, kernel, bias, context, t_max,
        softmax_scale=softmax_scale, block_t=block_t,
    )


def _fwd(x, kernel, bias, context, t_max, softmax_scale, block_t):
    out = _pool_forward(x, kernel, bias, context, t_max,
                        softmax_scale=softmax_scale, block_t=block_t)
    return out, (x, kernel, bias, context, t_max)


def _bwd(softmax_scale, block_t, res, g):
    x, kernel, bias, context, t_max = res

    def ref(x, kernel, bias, context):
        pooled, _ = attention_pool(
            x, kernel, bias, context, softmax_scale=softmax_scale, t_max=t_max
        )
        return pooled

    _, vjp = jax.vjp(ref, x, kernel, bias, context)
    dx, dk, db, dc = vjp(g)
    return dx, dk, db, dc, None


fused_attention_pool.defvjp(_fwd, _bwd)
