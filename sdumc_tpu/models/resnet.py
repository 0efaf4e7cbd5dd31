"""torchvision-style ResNet-18 embedding trunk (ImageNet visual extractor).

The reference's ImageNet path loads ``torchvision.models.resnet18(True)``
truncated before the fc head, so per-frame embeddings are the 512-d global
average pool (extract_imagenet_embedding.py:153-155,126-135). This is the
same trunk in NHWC Flax, reusing the MANet BasicBlock/BN components
(models/manet.py — MANet is itself a ResNet-18 derivative). One jitted
batched forward per clip replaces the per-32-frame torch loader loop.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from sdumc_tpu.models.manet import BN, BasicBlock


@dataclasses.dataclass(frozen=True)
class ResNetConfig:
    blocks: Tuple[int, ...] = (2, 2, 2, 2)      # resnet18
    channels: Tuple[int, ...] = (64, 128, 256, 512)
    stem_channels: int = 64

    @staticmethod
    def tiny(**kw) -> "ResNetConfig":
        base = dict(blocks=(1, 1, 1, 1), channels=(8, 16, 16, 24),
                    stem_channels=8)
        base.update(kw)
        return ResNetConfig(**base)


class ResNetEmbedding(nn.Module):
    """Returns the pre-fc pooled embedding [B, channels[-1]]."""

    cfg: ResNetConfig = ResNetConfig()

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """x: [B, H, W, 3] ImageNet-normalized."""
        c = self.cfg
        x = nn.Conv(c.stem_channels, (7, 7), strides=(2, 2), padding=3,
                    use_bias=False, name="conv1")(x)
        x = BN(name="bn1")(x, train)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        in_ch = c.stem_channels
        for li, (n_blocks, ch) in enumerate(zip(c.blocks, c.channels), start=1):
            for bi in range(n_blocks):
                stride = 2 if (bi == 0 and li > 1) else 1
                down = bi == 0 and (stride != 1 or in_ch != ch)
                x = BasicBlock(ch, stride, has_downsample=down,
                               name=f"layer{li}_{bi}")(x, train)
            in_ch = ch
        return jnp.mean(x, axis=(1, 2))  # adaptive avg pool to 1x1
