"""MANet face-expression encoder — the visual feature extractor.

Reference (feature_extraction/visual/manet/model/{manet,attention}.py): a
two-branch ResNet-18-style network over 224x224 face crops — a 4x(14x14)-
patch branch of CBAM-attention blocks and a multi-scale (Res2Net-style
split) branch — whose two 512-d global-average embeddings concatenate into
the [T, 1024] per-frame feature (extract_manet_embedding.py:82-92 with
return_embedding=True).

JAX rebuild in NHWC (TPU conv layout); BatchNorm carries running stats in
the `batch_stats` collection (torch semantics: batch stats while training,
running stats at inference; the RAF-DB trainer lives in
sdumc_tpu/extract/manet_train.py). Structure mirrors the reference exactly
so the released RAF-DB checkpoint converts losslessly.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class BN(nn.Module):
    """BatchNorm with torch semantics: batch statistics during training
    (running stats updated in the `batch_stats` collection), converted
    running stats at inference. torch momentum m -> flax momentum 1-m."""

    eps: float = 1e-5
    momentum: float = 0.9  # torch default 0.1

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=self.momentum,
            epsilon=self.eps,
            name="bn",
        )(x)


def conv3x3(planes, stride=1, name=None):
    return nn.Conv(planes, (3, 3), strides=(stride, stride), padding=1,
                   use_bias=False, name=name)


def conv1x1(planes, stride=1, name=None):
    return nn.Conv(planes, (1, 1), strides=(stride, stride), use_bias=False,
                   name=name)


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    has_downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = conv3x3(self.planes, self.stride, name="conv1")(x)
        out = BN(name="bn1")(out, train)
        out = nn.relu(out)
        out = conv3x3(self.planes, name="conv2")(out)
        out = BN(name="bn2")(out, train)
        if self.has_downsample:
            identity = BN(name="downsample_bn")(
                conv1x1(self.planes, self.stride, name="downsample_conv")(x),
                train,
            )
        return nn.relu(out + identity)


class CBAM(nn.Module):
    """Convolutional block attention (reference attention.py:75-85)."""

    channels: int
    reduction: int = 16

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.channels
        # channel gate: shared MLP over global avg & max pools
        mlp = [nn.Dense(c // self.reduction, name="gate_fc1"),
               nn.Dense(c, name="gate_fc2")]

        def gate(v):
            return mlp[1](nn.relu(mlp[0](v)))

        avg = jnp.mean(x, axis=(1, 2))
        mx = jnp.max(x, axis=(1, 2))
        ch = nn.sigmoid(gate(avg) + gate(mx))
        x = x * ch[:, None, None, :]
        # spatial gate: [max_c, mean_c] -> conv7 -> BN -> sigmoid
        comp = jnp.stack([jnp.max(x, axis=-1), jnp.mean(x, axis=-1)], axis=-1)
        s = nn.Conv(1, (7, 7), padding=3, use_bias=False, name="spatial_conv")(comp)
        s = BN(eps=1e-5, momentum=0.99, name="spatial_bn")(s, train)
        return x * nn.sigmoid(s)


class AttentionBlock(nn.Module):
    planes: int
    stride: int = 1
    has_downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = conv3x3(self.planes, self.stride, name="conv1")(x)
        out = BN(name="bn1")(out, train)
        out = nn.relu(out)
        out = conv3x3(self.planes, name="conv2")(out)
        out = BN(name="bn2")(out, train)
        out = CBAM(self.planes, name="cbam")(out, train)
        if self.has_downsample:
            identity = BN(name="downsample_bn")(
                conv1x1(self.planes, self.stride, name="downsample_conv")(x),
                train,
            )
        return nn.relu(out + identity)


class MulScaleBlock(nn.Module):
    """Res2Net-style cascaded split block with two parallel cascades summed
    (reference manet.py:47-126)."""

    planes: int
    stride: int = 1
    has_downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        w = self.planes // 4
        out = conv3x3(self.planes, self.stride, name="conv1")(x)
        out = BN(name="bn1")(out, train)
        out = nn.relu(out)
        sp = [out[..., i * w:(i + 1) * w] for i in range(4)]

        def cascade(tag):
            outs = []
            prev_relu = None
            for i in range(4):
                inp = sp[i] if i == 0 else prev_relu + sp[i]
                o = conv3x3(w, name=f"conv{tag}_2_{i + 1}")(inp)
                o = BN(name=f"bn{tag}_2_{i + 1}")(o, train)
                outs.append(o)
                prev_relu = nn.relu(o)
            return jnp.concatenate(outs, axis=-1)

        out = cascade(1) + cascade(2)
        if self.has_downsample:
            identity = BN(name="downsample_bn")(
                conv1x1(self.planes, self.stride, name="downsample_conv")(x),
                train,
            )
        return nn.relu(out + identity)


@dataclasses.dataclass(frozen=True)
class MANetConfig:
    layers: Sequence[int] = (2, 2, 2, 2)
    num_classes: int = 7  # RAF-DB checkpoint


class MANet(nn.Module):
    cfg: MANetConfig = MANetConfig()

    @nn.compact
    def __call__(self, x, *, return_embedding: bool = True, train: bool = False):
        """x: [B, 224, 224, 3] (NHWC). Returns [B, 1024] embedding (two
        512-d branch embeddings concatenated) or (logits_1, logits_2)."""
        cfg = self.cfg
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    name="conv1")(x)
        x = BN(name="bn1")(x, train)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        def stage(block_cls, xin, inplanes, planes, blocks, stride, name):
            h = xin
            for i in range(blocks):
                has_ds = i == 0 and (stride != 1 or inplanes != planes)
                h = block_cls(planes, stride if i == 0 else 1, has_ds,
                              name=f"{name}_{i}")(h, train)
            return h

        x = stage(BasicBlock, x, 64, 64, cfg.layers[0], 1, "layer1")
        x = stage(BasicBlock, x, 64, 128, cfg.layers[1], 2, "layer2")

        # branch 1: four 14x14 patches through per-patch attention stacks
        patches = [x[:, 0:14, 0:14], x[:, 0:14, 14:28],
                   x[:, 14:28, 0:14], x[:, 14:28, 14:28]]
        outs = []
        for pi, p in enumerate(patches, start=1):
            h = stage(AttentionBlock, p, 128, 256, cfg.layers[2], 2, f"layer3_1_p{pi}")
            h = stage(AttentionBlock, h, 256, 512, cfg.layers[3], 1, f"layer4_1_p{pi}")
            outs.append(h)
        top = jnp.concatenate([outs[0], outs[1]], axis=2)
        bottom = jnp.concatenate([outs[2], outs[3]], axis=2)
        branch1 = jnp.concatenate([top, bottom], axis=1)
        emb1 = jnp.mean(branch1, axis=(1, 2))

        # branch 2: multi-scale stack over the full map
        h = stage(MulScaleBlock, x, 128, 256, cfg.layers[2], 2, "layer3_2")
        h = stage(MulScaleBlock, h, 256, 512, cfg.layers[3], 2, "layer4_2")
        emb2 = jnp.mean(h, axis=(1, 2))

        if return_embedding:
            return jnp.concatenate([emb1, emb2], axis=1)
        out1 = nn.Dense(cfg.num_classes, name="fc_1")(emb1)
        out2 = nn.Dense(cfg.num_classes, name="fc_2")(emb2)
        return out1, out2
