"""Static-shape emulation of the reference's dynamic batch-max padding.

The reference pads every batch to its per-batch max length per modality and
runs the time softmax over *all* rows, pad rows included — pad rows carry
zero features, which after the input projection contribute the projection
bias (``toolkit/utils/read_data.py:223-248`` feeding
``wengnet_mosei_mult_views_text_missing.py:56-68``). Those pad rows therefore
*do* influence the pooled output; reproducing the published MSE requires
reproducing them.

TPU/XLA wants static shapes. We zero-pad each sequence up to a static bucket
length ``T_static`` and pass a traced scalar ``t_max`` = the dynamic batch
max. Rows ``t < t_max`` participate in the softmax exactly as in the
reference (real rows + bias-only pad rows, both already correct by
construction because zero-padding feeds the same projections); rows
``t >= t_max`` are masked out of the softmax entirely, making them
numerically invisible. Same graph, any bucket, bit-consistent results.
"""

from __future__ import annotations

import jax.numpy as jnp

NEG_INF = -1e30


def time_mask(length: int, t_max) -> jnp.ndarray:
    """Boolean [length] mask, True for positions < t_max (traced scalar)."""
    return jnp.arange(length) < t_max


def mask_time_scores(scores: jnp.ndarray, t_max, axis: int = 1) -> jnp.ndarray:
    """Set scores at time positions >= t_max to -inf along `axis`.

    `t_max` may be None (no masking), a python int, a traced scalar, or a
    per-row [B] vector (batch axis 0) — the fused dual-view forward stacks
    the teacher and student views along batch, whose text streams have
    different dynamic lengths (train/step.py)."""
    if t_max is None:
        return scores
    length = scores.shape[axis]
    t = jnp.asarray(t_max)
    if t.ndim == 0:
        mask = time_mask(length, t)
        shape = [1] * scores.ndim
        shape[axis] = length
        return jnp.where(mask.reshape(shape), scores, NEG_INF)
    assert t.ndim == 1 and axis != 0, (t.shape, axis)
    mask = jnp.arange(length)[None, :] < t[:, None]  # [B, length]
    shape = [1] * scores.ndim
    shape[0], shape[axis] = t.shape[0], length
    return jnp.where(mask.reshape(shape), scores, NEG_INF)
