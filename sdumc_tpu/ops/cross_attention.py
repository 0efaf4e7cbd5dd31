"""Multi-query cross attention over a frame sequence.

Semantics (reference ``Cross_Attention``,
``toolkit/models/wengnet_mosei_mult_views_text_missing.py:70-95``):

    q = query @ Wq + bq                    # [B, Q, D]
    k = tanh(x @ Wk + bk)                  # [B, T, D]
    attn = softmax(scale * (k @ q^T), t)   # [B, T, Q], softmax over time
    out[b, q] = sum_t attn[b, t, q] * x[b, t]

The reference materializes the Q outputs with a python list comprehension of
per-query multiplies (:91-93); here it is a single batched einsum so XLA maps
it straight onto the MXU. A fused Pallas kernel covers the long-sequence
regime (see ops/pallas/fused_cross.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sdumc_tpu.ops.masking import mask_time_scores


def multi_query_cross_attention(
    query: jnp.ndarray,
    x: jnp.ndarray,
    q_kernel: jnp.ndarray,
    q_bias: jnp.ndarray,
    k_kernel: jnp.ndarray,
    k_bias: jnp.ndarray,
    *,
    softmax_scale: float = 0.3,
    t_max=None,
):
    """Returns (out [B, Q, D], attn [B, T, Q])."""
    q = query @ q_kernel + q_bias                       # [B, Q, D]
    k = jnp.tanh(x @ k_kernel + k_bias)                 # [B, T, D]
    scores = jnp.einsum("btd,bqd->btq", k, q)
    scores = mask_time_scores(softmax_scale * scores, t_max, axis=1)
    attn = jax.nn.softmax(scores, axis=1)               # over time
    out = jnp.einsum("btd,btq->bqd", x, attn)
    return out, attn
