"""PyTorch -> JAX weight converter for the SDUMC fusion checkpoint.

The reference releases a 49 MB ``.pt`` (``{'epoch','state_dict','optimizer'}``,
save pattern main_frame_val_text_missing.py:375) and loads it with a
``module.`` prefix strip and ``strict=False``
(main_frame_val_text_missing_inference.py:341-343). This module reproduces
those load semantics against our Flax parameter tree:

* ``module.`` and the ``get_models`` wrapper's ``model.`` prefixes are
  stripped;
* torch keys with no Flax destination are reported but ignored
  (strict=False);
* Flax params absent from the torch dict keep their initialized values;
* ``nn.Linear.weight`` ([out, in]) transposes into Dense ``kernel``
  ([in, out]).

No torch import is required unless reading an actual ``.pt`` file.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

_MLP_NAMES = {
    "audio_mlp",
    "text_mlp",
    "video_mlp",
    "attention_mlp",
    "cross_fused_query_mlp",
    "cross_at_query_mlp",
    "cross_tv_query_mlp",
    "cross_av_query_mlp",
    "cross_audio_query_mlp",
    "cross_text_query_mlp",
    "cross_video_query_mlp",
    "cross_audio_mlp",
    "cross_text_mlp",
    "cross_video_mlp",
    "cross_attention_mlp",
}
_PLAIN_LINEAR = {
    "frame_dim_reshape_0",
    "frame_dim_reshape_1",
    "frame_dim_reshape_2",
    "fc_att",
    "cross_fc_att",
    "fc_out_e",
    "fc_out_v",
    "fc_out_ev",
}
_FRA2UTT = {"fra2utt_0", "fra2utt_1", "fra2utt_2"}
_XATT = {"cross_att_fra2utt_0", "cross_att_fra2utt_1", "cross_att_fra2utt_2"}
_IMAG = {"missing_text_imagination_mlp", "missing_cross_text_query_imagination_mlp"}


def _leaf(torch_leaf: str) -> Optional[str]:
    return {"weight": "kernel", "bias": "bias"}.get(torch_leaf)


def flax_path_for(torch_key: str) -> Optional[Tuple[str, ...]]:
    """Map one reference state_dict key to a Flax param path, or None."""
    parts = torch_key.split(".")
    name = parts[0]
    if name in _MLP_NAMES:
        # nn.Sequential of [Linear, ReLU, Dropout]* -> Linear at idx 0,3,6,..
        idx = int(parts[1])
        return (name, f"linear_{idx // 3}", "dense", _leaf(parts[2]))
    if name == "orgin_linear_change":
        # Sequential(Linear, ReLU, Linear) -> idx 0, 2 (:246-250)
        idx = int(parts[1])
        return (f"orgin_linear_change_{idx // 2}", "dense", _leaf(parts[2]))
    if name in _FRA2UTT:
        if parts[1] == "attention_context_vector":
            return (name, "context")
        return (name, parts[1], "dense", _leaf(parts[2]))
    if name in _XATT:
        return (name, parts[1], "dense", _leaf(parts[2]))
    if name in _PLAIN_LINEAR:
        return (name, "dense", _leaf(parts[1]))
    if name == "prelu":
        return ("prelu_weight",)
    if name == "layer_normali":
        # torch LayerNorm weight/bias -> flax scale/bias (no transpose)
        return ("layer_normali", {"weight": "scale", "bias": "bias"}[parts[1]])
    if name in _IMAG:
        sub = parts[1]
        if sub == "transition":
            # Sequential(Linear, ReLU, Linear) -> idx 0, 2 (:128-132)
            idx = int(parts[2])
            return (name, f"transition_{idx // 2}", "dense", _leaf(parts[3]))
        # encoder_N / decoder_N Sequentials -> Linear at idx 0,3,.. (:138-168)
        blk = sub.split("_")[-1]
        kind = sub.rsplit("_", 1)[0]
        idx = int(parts[2])
        return (name, f"{kind}_{blk}_{idx // 3}", "dense", _leaf(parts[3]))
    return None


def _set_path(tree: dict, path: Tuple[str, ...], value) -> bool:
    node = tree
    for p in path[:-1]:
        if not isinstance(node, dict) or p not in node:
            return False
        node = node[p]
    if not isinstance(node, dict) or path[-1] not in node:
        return False
    node[path[-1]] = value
    return True


def torch_state_dict_to_params(
    state_dict: Dict[str, "np.ndarray"],
    params_template: dict,
) -> Tuple[dict, Dict[str, List[str]]]:
    """Convert a torch state_dict (tensors or ndarrays) into Flax params.

    Returns (params, report) with report['unmapped'] (torch keys with no
    Flax home — strict=False semantics) and report['missing'] (Flax leaves
    the torch dict did not provide).
    """
    import jax

    params = jax.tree_util.tree_map(lambda x: np.array(x), params_template)
    filled = set()
    unmapped: List[str] = []

    for key, value in state_dict.items():
        k = key
        for prefix in ("module.", "model."):
            if k.startswith(prefix):
                k = k[len(prefix):]
        path = flax_path_for(k)
        if path is None or path[-1] is None:
            unmapped.append(key)
            continue
        # np.array (not asarray): tensor.numpy() aliases torch storage; a
        # view here would let later in-place torch updates mutate the
        # "converted" params.
        arr = np.array(
            value.detach().cpu().numpy() if hasattr(value, "detach") else value,
            dtype=np.float32,
        )
        if path[-1] == "kernel" and arr.ndim == 2:
            arr = arr.T  # torch Linear [out, in] -> Dense [in, out]
        if not _set_path(params, path, arr):
            unmapped.append(key)
            continue
        filled.add(path)

    missing = []

    def _walk(node, prefix):
        if isinstance(node, dict):
            for k, v in node.items():
                _walk(v, prefix + (k,))
        else:
            if prefix not in filled:
                missing.append("/".join(prefix))

    _walk(params, ())
    return params, {"unmapped": unmapped, "missing": missing}


def load_torch_checkpoint(path: str, params_template: dict):
    """Read a reference ``.pt`` checkpoint file and convert it."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    state_dict = blob.get("state_dict", blob) if isinstance(blob, dict) else blob
    return torch_state_dict_to_params(state_dict, params_template)
