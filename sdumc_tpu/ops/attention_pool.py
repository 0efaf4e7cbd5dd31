"""Frame->utterance attention pooling (the FRA2UTT op).

Semantics (reference ``FRA2UTT_new``,
``toolkit/models/wengnet_mosei_mult_views_text_missing.py:46-68``):

    scores[b, t] = tanh(x[b, t] @ W + b) . v          # learned context vector
    attn = softmax(scale * scores, axis=t)            # over *all* rows < t_max
    out[b]  = sum_t attn[b, t] * x[b, t]

This file holds the pure-XLA formulation (einsum; XLA fuses the tanh and the
weighted sum into the matmuls) plus a fused Pallas kernel used on TPU for
long sequences, where avoiding the [B, T, D] tanh-projection round-trip to
HBM matters. Both are numerically interchangeable; tests pin them together.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from sdumc_tpu.ops.masking import mask_time_scores


def attention_pool(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray,
    context: jnp.ndarray,
    *,
    softmax_scale: float = 0.3,
    t_max=None,
):
    """Attention-pool frames into one utterance vector.

    Args:
      x: [B, T, D] frame features (zero-padded beyond sequence length).
      kernel: [D, D] projection kernel (input_proj, stored transposed vs torch).
      bias: [D] projection bias.
      context: [D] learned context vector.
      softmax_scale: scale applied to scores before softmax (reference 0.3).
      t_max: traced scalar — rows >= t_max are masked from the softmax
        (see ops/masking.py). None disables masking.

    Returns:
      (pooled [B, D], attn [B, T, 1]) — attn matches the reference's
      `vector_attention` shape for downstream consumers.
    """
    proj = jnp.tanh(x @ kernel + bias)
    scores = jnp.einsum("btd,d->bt", proj, context)
    scores = mask_time_scores(softmax_scale * scores, t_max, axis=1)
    attn = jax.nn.softmax(scores, axis=1)
    pooled = jnp.einsum("btd,bt->bd", x, attn)
    return pooled, attn[..., None]


@functools.partial(jax.jit, static_argnames=("softmax_scale",))
def attention_pool_xla(x, kernel, bias, context, softmax_scale=0.3, t_max=None):
    return attention_pool(
        x, kernel, bias, context, softmax_scale=softmax_scale, t_max=t_max
    )
