"""Train state: torch-Adam-equivalent optimizer via optax.

Reference optimizer (main_frame_val_text_missing.py:317): Adam(lr, weight
decay 1e-5). torch-Adam's weight_decay adds ``wd * param`` to the gradient
*before* the moment updates (it is L2, not AdamW) — reproduced here as
``add_decayed_weights`` ahead of ``scale_by_adam``.
"""

from __future__ import annotations

from typing import Callable

import optax
from flax.training import train_state


class TrainState(train_state.TrainState):
    pass


def make_optimizer(lr_schedule: Callable, l2: float = 1e-5) -> optax.GradientTransformation:
    return optax.chain(
        optax.add_decayed_weights(l2),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.scale_by_learning_rate(lr_schedule),  # includes the -1 sign
    )


def create_train_state(model, params, lr_schedule, l2: float = 1e-5) -> TrainState:
    state = TrainState.create(
        apply_fn=model.apply,
        params=params,
        tx=make_optimizer(lr_schedule, l2),
    )
    # Avals must be stable across steps or jit silently recompiles the
    # whole train step (~20s on CPU) once per promotion: flax's python-int
    # step becomes a traced int32, and any weak-typed param/opt leaf (e.g.
    # a scalar-init param) becomes strong after the first update. Pin
    # everything up front: one compile total.
    import jax
    import jax.numpy as jnp

    def pin(x):
        if isinstance(x, (int, float)):
            return jnp.asarray(x)
        if hasattr(x, "dtype"):
            return jax.lax.convert_element_type(x, x.dtype)  # drops weak_type
        return x

    return jax.tree_util.tree_map(pin, state.replace(step=jnp.asarray(0, jnp.int32)))
