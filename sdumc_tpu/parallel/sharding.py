"""Tensor-parallel parameter shardings for the extractor graphs.

The reference shards its 7B/13B extractor LLMs across GPUs with
``accelerate.dispatch_model`` (pipeline-style layer placement,
feature_extraction/text/extract_text_embedding_huggingface.py:204-210 and
llm4wav/extract_wavlm_vicuna.py:306-312). The TPU-native equivalent is
tensor parallelism over the mesh's ``model`` axis: annotate each weight
with a PartitionSpec and let GSPMD propagate shardings and insert the
collectives (all-gather / reduce-scatter over ICI).

The layout is the standard Megatron split, expressed as path-regex rules:

* attention q/k/v projections: shard the output (head) dimension —
  activations become head-sharded after the [B,T,H,hd] reshape;
* attention output projection: shard the input dimension — the matmul
  produces partial sums and GSPMD inserts one psum per layer;
* MLP up/gate: shard output; MLP down: shard input (second psum);
* embeddings / lm_head: shard the hidden (or vocab-out) dimension;
* norms, gates and other small vectors: replicated.

Rules silently fall back to replication when the model-axis size does not
divide the dimension (e.g. TP=8 over a 4-head tiny config) — correctness
never depends on the spec, only efficiency does.
"""

from __future__ import annotations

import re
from typing import List, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (path regex, spec) — first match wins; paths are "/"-joined param key paths
# like "layers_0/self_attn/q_proj/kernel".
LLAMA_RULES: List[Tuple[str, P]] = [
    (r"(q|k|v)_proj/kernel$", P(None, "model")),
    (r"o_proj/kernel$", P("model", None)),
    (r"(gate|up)_proj/kernel$", P(None, "model")),
    (r"down_proj/kernel$", P("model", None)),
    (r"embed_tokens/embedding$", P(None, "model")),
    (r"lm_head/kernel$", P(None, "model")),
]

WAVLM_RULES: List[Tuple[str, P]] = [
    (r"(q|k|v)_proj/kernel$", P(None, "model")),
    (r"(q|k|v)_proj/bias$", P("model")),
    (r"out_proj/kernel$", P("model", None)),
    (r"intermediate_dense/kernel$", P(None, "model")),
    (r"intermediate_dense/bias$", P("model")),
    (r"output_dense/kernel$", P("model", None)),
    (r"rel_attn_embed$", P(None, "model")),
    (r"gru_rel_pos_const$", P(None, "model", None, None)),
]


def _flatten_paths(tree):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    paths = [
        "/".join(
            k.key if hasattr(k, "key") else str(getattr(k, "idx", k))
            for k in path
        )
        for path, _ in flat
    ]
    leaves = [leaf for _, leaf in flat]
    return paths, leaves, treedef


def _spec_for(path: str, shape: Tuple[int, ...], rules, axis_size: int) -> P:
    for pattern, spec in rules:
        if re.search(pattern, path):
            # scan-stacked layout ("layers/..." vs "layers_0/..."): every
            # leaf carries a leading [num_layers] axis that stays
            # replicated; the rule's spec applies to the trailing dims
            if re.search(r"(^|/)layers/", path):
                spec = P(None, *spec)
            if len(spec) > len(shape):
                return P()
            for dim, name in zip(shape, spec):
                if name is not None and dim % axis_size != 0:
                    return P()  # indivisible -> replicate (correct, just not TP)
            return spec
    return P()


def partition_specs(params, rules: Sequence[Tuple[str, P]], mesh: Mesh,
                    model_axis: str = "model"):
    """Pytree of PartitionSpec matching ``params``, by path-regex rules."""
    axis_size = dict(zip(mesh.axis_names, mesh.devices.shape))[model_axis]
    paths, leaves, treedef = _flatten_paths(params)
    specs = [
        _spec_for(p, np.shape(leaf), rules, axis_size)
        for p, leaf in zip(paths, leaves)
    ]
    return jax.tree_util.tree_unflatten(treedef, specs)


def llama_specs(params, mesh: Mesh):
    return partition_specs(params, LLAMA_RULES, mesh)


def wavlm_specs(params, mesh: Mesh):
    return partition_specs(params, WAVLM_RULES, mesh)


def shard_params(params, mesh: Mesh, specs):
    """device_put every leaf onto the mesh with its spec (replicated where
    the spec is empty). Accepts raw numpy leaves from the converters."""
    flat, treedef = jax.tree_util.tree_flatten(params)
    flat_specs = treedef.flatten_up_to(specs)
    out = [
        jax.device_put(leaf, NamedSharding(mesh, spec))
        for leaf, spec in zip(flat, flat_specs)
    ]
    return jax.tree_util.tree_unflatten(treedef, out)


def shard_model_params(params, mesh: Mesh, family: str):
    """Convenience: shard a converted param tree for a model family
    ("llama" or "wavlm") over the mesh's model axis."""
    rules = {"llama": LLAMA_RULES, "wavlm": WAVLM_RULES}[family]
    return shard_params(params, mesh, partition_specs(params, rules, mesh))


def tp_sharding_summary(params, specs) -> str:
    """Human-readable count of sharded vs replicated leaves (for logs)."""
    flat, treedef = jax.tree_util.tree_flatten(params)
    leaves = flat
    spec_leaves = treedef.flatten_up_to(specs)
    n_sharded = sum(1 for s in spec_leaves if any(a is not None for a in s))
    sharded_bytes = sum(
        np.size(l) * np.dtype(np.asarray(l).dtype).itemsize
        for l, s in zip(leaves, spec_leaves)
        if any(a is not None for a in s)
    )
    total_bytes = sum(
        np.size(l) * np.dtype(np.asarray(l).dtype).itemsize for l in leaves
    )
    return (
        f"TP: {n_sharded}/{len(leaves)} tensors sharded "
        f"({sharded_bytes / max(total_bytes, 1):.0%} of {total_bytes / 2**20:.0f} MiB)"
    )
