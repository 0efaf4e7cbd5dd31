"""LR schedule: linear warmup then step decay.

Reference (main_frame_val_text_missing.py:318-321): LambdaLR with
    factor(epoch) = (epoch+1)/5                  for epoch < 5
                  = 0.9 ** ((epoch+1-5) // 10)   otherwise
stepped once per epoch. We express it per-step for optax by flooring the
step counter to an epoch index.
"""

from __future__ import annotations

import jax.numpy as jnp


def warmup_step_decay_factor(
    epoch,
    warmup_epochs: int = 5,
    gamma: float = 0.9,
    stepsize: int = 10,
):
    """The LambdaLR multiplier; `epoch` may be a traced int array."""
    epoch = jnp.asarray(epoch)
    warm = (epoch + 1) / warmup_epochs
    decay = gamma ** ((epoch + 1 - warmup_epochs) // stepsize)
    return jnp.where(epoch < warmup_epochs, warm, decay)


def make_lr_schedule(
    base_lr: float,
    steps_per_epoch: int,
    warmup_epochs: int = 5,
    gamma: float = 0.9,
    stepsize: int = 10,
):
    def schedule(step):
        epoch = step // max(steps_per_epoch, 1)
        return base_lr * warmup_step_decay_factor(epoch, warmup_epochs, gamma, stepsize)

    return schedule
