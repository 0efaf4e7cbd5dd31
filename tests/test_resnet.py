"""ImageNet ResNet-18 embedding trunk parity vs the reference's own torch
ResNet classes (extract_imagenet_embedding.py:27-140; the live path is the
torchvision twin truncated before fc, :153-155)."""

import ast
import pathlib

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from sdumc_tpu.convert.torch_resnet import torch_resnet_to_params
from sdumc_tpu.models.resnet import ResNetConfig, ResNetEmbedding


@pytest.fixture(scope="module")
def ref_resnet_cls():
    """Execute just the reference ResNet/BasicBlock classes (their module
    imports torchvision, unavailable here)."""
    path = pathlib.Path(
        "/root/reference/feature_extraction/visual/extract_imagenet_embedding.py")
    if not path.exists():
        pytest.skip("reference unavailable")
    tree = ast.parse(path.read_text())
    wanted = [n for n in tree.body if isinstance(n, ast.ClassDef)
              and n.name in ("Flatten", "BasicBlock", "ResNet")]
    glb = {"torch": torch, "nn": torch.nn, "F": torch.nn.functional}
    exec(compile(ast.Module(body=wanted, type_ignores=[]), "<ref>", "exec"), glb)
    return glb["ResNet"], glb["BasicBlock"]


@pytest.mark.parametrize("blocks,channels", [
    # channel count must grow per stage: the reference class only inserts
    # a downsample on channel change (its real configs always change)
    ((1, 1, 1, 1), (8, 16, 24, 32)),
    ((2, 2, 2, 2), (8, 16, 32, 64)),
])
def test_resnet_embedding_parity(ref_resnet_cls, blocks, channels):
    RefResNet, RefBlock = ref_resnet_cls
    torch.manual_seed(0)
    tm = RefResNet(RefBlock, list(blocks), list(channels), 10).eval()

    variables = torch_resnet_to_params(tm.state_dict())
    cfg = ResNetConfig(blocks=blocks, channels=channels,
                       stem_channels=channels[0])
    model = ResNetEmbedding(cfg)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        _, ref_h = tm(torch.tensor(x))
    got = np.asarray(
        model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    )
    assert got.shape == ref_h.numpy().shape == (2, channels[-1])
    np.testing.assert_allclose(got, ref_h.numpy(), rtol=1e-4, atol=1e-5)


def test_resnet18_converter_covers_all_keys(ref_resnet_cls):
    RefResNet, RefBlock = ref_resnet_cls
    tm = RefResNet(RefBlock, [1, 1, 1, 1], [8, 16, 24, 32], 10)
    variables = torch_resnet_to_params(tm.state_dict())
    import jax

    n_converted = sum(np.size(l) for l in jax.tree_util.tree_leaves(variables))
    n_torch = sum(
        v.numel() for k, v in tm.state_dict().items()
        if not k.startswith("fc.") and "num_batches_tracked" not in k
    )
    assert n_converted == n_torch
