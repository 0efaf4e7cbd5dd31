"""MANet trainer smoke: the two-head beta loss + SGD step learn."""

import pytest

import numpy as np

import jax
import jax.numpy as jnp

from sdumc_tpu.extract.manet_train import make_train_step, step_lr, two_head_loss
from sdumc_tpu.models.manet import MANet, MANetConfig


def test_two_head_loss_matches_torch_semantics():
    import torch

    rng = np.random.default_rng(0)
    l1 = rng.normal(size=(8, 7)).astype(np.float32)
    l2 = rng.normal(size=(8, 7)).astype(np.float32)
    y = rng.integers(0, 7, size=(8,))
    beta = 0.6
    ce = torch.nn.CrossEntropyLoss()
    ref = beta * ce(torch.tensor(l1), torch.tensor(y)) + (1 - beta) * ce(
        torch.tensor(l2), torch.tensor(y)
    )
    loss, acc = two_head_loss(jnp.array(l1), jnp.array(l2), jnp.array(y), beta)
    assert np.isclose(float(loss), float(ref), rtol=1e-5)
    assert 0.0 <= float(acc) <= 1.0


@pytest.mark.slow  # >20 s on this 1-core host; full suite still runs it
def test_train_step_reduces_loss():
    model = MANet(MANetConfig(layers=(1, 1, 1, 1), num_classes=3))
    rng = np.random.default_rng(1)
    imgs = rng.uniform(size=(2, 224, 224, 3)).astype(np.float32)
    labels = np.array([0, 1])
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)),
                           return_embedding=False)
    create_state, step = make_train_step(model, 0.6, step_lr(0.05, 100))
    state = create_state(variables)
    first = None
    for _ in range(3):
        state, metrics = step(state, jnp.asarray(imgs), jnp.asarray(labels))
        if first is None:
            first = float(metrics["loss"])
    assert float(metrics["loss"]) < first
