"""torchvision ResNet state dict -> Flax ResNetEmbedding variables.

Key layout is torchvision's (conv1, bn1, layer{1..4}.{j}.{conv1,bn1,conv2,
bn2,downsample.0,downsample.1}); the fc head is dropped — the reference
truncates the model before it (extract_imagenet_embedding.py:153-155).
Returns {"params": ..., "batch_stats": ...} like the MANet converter.
"""

from __future__ import annotations

from typing import Dict

from sdumc_tpu.convert.torch_manet import _a, _conv, _set


def torch_resnet_to_params(state_dict: Dict) -> dict:
    sd = {}
    for k, v in state_dict.items():
        sd[k[len("module."):] if k.startswith("module.") else k] = v

    params: dict = {}
    stats: dict = {}

    def bn(scope, prefix):
        _set(params, (*scope, "bn", "scale"), _a(sd[f"{prefix}.weight"]))
        _set(params, (*scope, "bn", "bias"), _a(sd[f"{prefix}.bias"]))
        _set(stats, (*scope, "bn", "mean"), _a(sd[f"{prefix}.running_mean"]))
        _set(stats, (*scope, "bn", "var"), _a(sd[f"{prefix}.running_var"]))

    _set(params, ("conv1", "kernel"), _conv(_a(sd["conv1.weight"])))
    bn(("bn1",), "bn1")

    li = 1
    while f"layer{li}.0.conv1.weight" in sd:
        bi = 0
        while f"layer{li}.{bi}.conv1.weight" in sd:
            scope = f"layer{li}_{bi}"
            prefix = f"layer{li}.{bi}"
            _set(params, (scope, "conv1", "kernel"),
                 _conv(_a(sd[f"{prefix}.conv1.weight"])))
            bn((scope, "bn1"), f"{prefix}.bn1")
            _set(params, (scope, "conv2", "kernel"),
                 _conv(_a(sd[f"{prefix}.conv2.weight"])))
            bn((scope, "bn2"), f"{prefix}.bn2")
            if f"{prefix}.downsample.0.weight" in sd:
                _set(params, (scope, "downsample_conv", "kernel"),
                     _conv(_a(sd[f"{prefix}.downsample.0.weight"])))
                bn((scope, "downsample_bn"), f"{prefix}.downsample.1")
            bi += 1
        li += 1

    return {"params": params, "batch_stats": stats}
