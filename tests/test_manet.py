"""MANet parity vs the reference torch implementation (AST-imported)."""

import ast
import pathlib

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from sdumc_tpu.convert.torch_manet import torch_manet_to_params
from sdumc_tpu.models.manet import MANet, MANetConfig

REF = pathlib.Path("/root/reference/feature_extraction/visual/manet/model")


@pytest.fixture(scope="module")
def torch_manet():
    if not REF.exists():
        pytest.skip("reference unavailable")
    glb = {"torch": torch, "nn": torch.nn, "F": torch.nn.functional}
    att = ast.parse((REF / "attention.py").read_text())
    exec(compile(att, "<attention>", "exec"), glb)
    man = ast.parse((REF / "manet.py").read_text())
    body = [n for n in man.body if not isinstance(n, (ast.Import, ast.ImportFrom))
            and not (isinstance(n, ast.If) and getattr(n.test.left, "id", "") == "__name__")]
    exec(compile(ast.Module(body=body, type_ignores=[]), "<manet>", "exec"), glb)
    torch.manual_seed(0)
    model = glb["manet"](num_classes=7)
    model.eval()
    # randomize BN running stats so the inference-BN conversion is exercised
    gen = torch.Generator().manual_seed(1)
    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean = torch.randn(m.num_features, generator=gen) * 0.1
            m.running_var = torch.rand(m.num_features, generator=gen) + 0.5
    return model


def test_manet_embedding_parity(torch_manet):
    variables = torch_manet_to_params(torch_manet.state_dict())
    model = MANet(MANetConfig(num_classes=7))
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 3, 224, 224)).astype(np.float32) * 0.5
    with torch.no_grad():
        ref = torch_manet(torch.tensor(x), return_embedding=True).numpy()
    got = np.asarray(
        model.apply(variables, jnp.array(np.transpose(x, (0, 2, 3, 1))))
    )
    assert got.shape == ref.shape == (2, 1024)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-4)


def test_manet_logits_parity(torch_manet):
    variables = torch_manet_to_params(torch_manet.state_dict())
    model = MANet(MANetConfig(num_classes=7))
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 3, 224, 224)).astype(np.float32) * 0.5
    with torch.no_grad():
        r1, r2 = torch_manet(torch.tensor(x), return_embedding=False)
    g1, g2 = model.apply(
        variables, jnp.array(np.transpose(x, (0, 2, 3, 1))),
        return_embedding=False,
    )
    np.testing.assert_allclose(np.asarray(g1), r1.numpy(), rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(g2), r2.numpy(), rtol=2e-3, atol=2e-4)
