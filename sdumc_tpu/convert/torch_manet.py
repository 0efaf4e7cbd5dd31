"""torch MANet checkpoint -> Flax variables (NCHW -> NHWC kernels).

Returns ``{"params": ..., "batch_stats": ...}``: BatchNorm scale/bias go to
params, running mean/var to batch_stats (torch-equivalent semantics, see
models/manet.py BN). The reference loads its RAF-DB checkpoint with a
'module.' strip and strict=False (extract_manet_embedding.py:110-112).
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _a(v):
    if hasattr(v, "detach"):
        v = v.detach().to("cpu").float().numpy()
    return np.asarray(v, np.float32)


def _conv(w):  # [O, I, kh, kw] -> [kh, kw, I, O]
    return np.transpose(w, (2, 3, 1, 0))


def _set(tree: dict, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def torch_manet_to_params(state_dict: Dict) -> dict:
    sd = {}
    for k, v in state_dict.items():
        sd[k[len("module."):] if k.startswith("module.") else k] = v

    params: dict = {}
    stats: dict = {}

    def bn(flax_scope, torch_prefix):
        _set(params, (*flax_scope, "bn", "scale"), _a(sd[f"{torch_prefix}.weight"]))
        _set(params, (*flax_scope, "bn", "bias"), _a(sd[f"{torch_prefix}.bias"]))
        _set(stats, (*flax_scope, "bn", "mean"), _a(sd[f"{torch_prefix}.running_mean"]))
        _set(stats, (*flax_scope, "bn", "var"), _a(sd[f"{torch_prefix}.running_var"]))

    _set(params, ("conv1", "kernel"), _conv(_a(sd["conv1.weight"])))
    bn(("bn1",), "bn1")

    def block_common(scope, prefix):
        _set(params, (scope, "conv1", "kernel"), _conv(_a(sd[f"{prefix}.conv1.weight"])))
        bn((scope, "bn1"), f"{prefix}.bn1")
        if f"{prefix}.downsample.0.weight" in sd:
            _set(params, (scope, "downsample_conv", "kernel"),
                 _conv(_a(sd[f"{prefix}.downsample.0.weight"])))
            bn((scope, "downsample_bn"), f"{prefix}.downsample.1")

    def basic_or_attention(scope, prefix):
        block_common(scope, prefix)
        _set(params, (scope, "conv2", "kernel"), _conv(_a(sd[f"{prefix}.conv2.weight"])))
        bn((scope, "bn2"), f"{prefix}.bn2")
        if f"{prefix}.cbam.ChannelGate.mlp.1.weight" in sd:
            _set(params, (scope, "cbam", "gate_fc1", "kernel"),
                 _a(sd[f"{prefix}.cbam.ChannelGate.mlp.1.weight"]).T)
            _set(params, (scope, "cbam", "gate_fc1", "bias"),
                 _a(sd[f"{prefix}.cbam.ChannelGate.mlp.1.bias"]))
            _set(params, (scope, "cbam", "gate_fc2", "kernel"),
                 _a(sd[f"{prefix}.cbam.ChannelGate.mlp.3.weight"]).T)
            _set(params, (scope, "cbam", "gate_fc2", "bias"),
                 _a(sd[f"{prefix}.cbam.ChannelGate.mlp.3.bias"]))
            _set(params, (scope, "cbam", "spatial_conv", "kernel"),
                 _conv(_a(sd[f"{prefix}.cbam.SpatialGate.spatial.conv.weight"])))
            bn((scope, "cbam", "spatial_bn"), f"{prefix}.cbam.SpatialGate.spatial.bn")

    def mulscale(scope, prefix):
        block_common(scope, prefix)
        for tag in (1, 2):
            for i in range(1, 5):
                _set(params, (scope, f"conv{tag}_2_{i}", "kernel"),
                     _conv(_a(sd[f"{prefix}.conv{tag}_2_{i}.weight"])))
                bn((scope, f"bn{tag}_2_{i}"), f"{prefix}.bn{tag}_2_{i}")

    n_blocks = 2
    for stage, conv_fn in (
        [("layer1", basic_or_attention), ("layer2", basic_or_attention)]
        + [(f"layer3_1_p{i}", basic_or_attention) for i in range(1, 5)]
        + [(f"layer4_1_p{i}", basic_or_attention) for i in range(1, 5)]
        + [("layer3_2", mulscale), ("layer4_2", mulscale)]
    ):
        for b in range(n_blocks):
            if f"{stage}.{b}.conv1.weight" in sd:
                conv_fn(f"{stage}_{b}", f"{stage}.{b}")

    for fc in ("fc_1", "fc_2"):
        if f"{fc}.weight" in sd:
            _set(params, (fc, "kernel"), _a(sd[f"{fc}.weight"]).T)
            _set(params, (fc, "bias"), _a(sd[f"{fc}.bias"]))
    return {"params": params, "batch_stats": stats}
