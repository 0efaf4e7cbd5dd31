"""Hyperparameter grids + random-selection tuner.

Reference: per-model search grids in toolkit/model-tune.yaml consumed by
merge_args_config/func_random_select (toolkit/utils/functions.py:144-159) —
each tuning run samples one value per listed hyperparameter. Rebuilt without
a yaml dependency gate: grids live in TUNE_GRIDS (a yaml file can override
them when pyyaml is available).
"""

from __future__ import annotations

import dataclasses
import random
from typing import Any, Dict

# per-model grids (model-tune.yaml equivalent; live model + baselines slots)
TUNE_GRIDS: Dict[str, Dict[str, list]] = {
    "wengnet_mosei_mult_views_text_missing": {
        "lr": [1e-4, 3e-4, 5e-5],
        "batch_size": [64, 96, 128],
        "dropout": [0.3, 0.5],
        "rnc_loss_w": [0.0, 0.5, 0.8],
        "features_loss_w": [0.0, 0.1, 0.13],
        "text_feat_loss_w": [0.0, 0.1],
        "text_query_feat_loss_w": [0.0, 0.7],
    },
    # clean extension slots for the stripped baseline families (SURVEY: the
    # reference yaml carries grids for attention/lmf/misa/mmim/tfn/...)
    "attention": {"lr": [1e-4, 1e-3], "hidden": [128, 256], "dropout": [0.2, 0.5]},
    "tfn": {"lr": [1e-4, 1e-3], "rank": [4, 8, 16], "dropout": [0.2, 0.5]},
    "lmf": {"lr": [1e-4, 1e-3], "rank": [4, 8, 16], "dropout": [0.2, 0.5]},
    "mult": {"lr": [1e-4, 1e-3], "layers": [4, 6], "heads": [4, 8]},
}


def load_grids(yaml_path: str | None = None) -> Dict[str, Dict[str, list]]:
    if yaml_path:
        try:
            import yaml

            with open(yaml_path) as f:
                return yaml.safe_load(f)
        except ImportError:
            pass
    return TUNE_GRIDS


def random_select(grid: Dict[str, list], seed: int | None = None) -> Dict[str, Any]:
    """One random draw per hyperparameter (reference func_random_select)."""
    rng = random.Random(seed)
    return {k: rng.choice(v) for k, v in grid.items()}


def merge_args_config(args, model_name: str, seed: int | None = None,
                      yaml_path: str | None = None):
    """Overlay a random grid draw onto an argparse namespace / dataclass
    (reference merge_args_config, functions.py:144-159)."""
    grids = load_grids(yaml_path)
    if model_name not in grids:
        return args, {}
    draw = random_select(grids[model_name], seed)
    for key, value in draw.items():
        if dataclasses.is_dataclass(args):
            if hasattr(args, key):
                args = dataclasses.replace(args, **{key: value})
        elif hasattr(args, key):
            setattr(args, key, value)
    return args, draw
