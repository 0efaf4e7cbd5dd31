"""Sequence-parallel WavLM forward: one clip's frames sharded over chips.

The single-chip path already removes the reference's long-clip workarounds
(bucketing + flash attention; the reference deletes its 51 longest train
clips, toolkit/dataloader/cmumosei.py:10-62). This driver is for sequences
past one chip's HBM: the conv prologue (feature encoder + kernel-128
positional conv — both need unsharded time) runs replicated, then the
24-layer transformer stack runs under ``shard_map`` with the time axis
split over the mesh — per-frame ops (LN/FFN/projections) are local, and
attention rotates K/V blocks around the ring
(parallel/ring_attention.py, attention_impl="ring").

Exact: matches the single-device forward on every hidden-state tap
(tests/test_wavlm_sp.py, 8-device CPU mesh).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from sdumc_tpu.models.wavlm import WavLMConfig, WavLMModel


def wavlm_forward_sp(
    cfg: WavLMConfig,
    params,
    wav: jnp.ndarray,
    mesh,
    *,
    axis: str = "data",
    pad_mask: Optional[jnp.ndarray] = None,
    output_hidden_states: bool = False,
):
    """[B, S] waveform -> WavLMModel-style output dict, frames sharded over
    ``mesh``'s ``axis`` for the transformer stack. ``pad_mask`` is the
    frame-level mask ([B, T], True = real), as in WavLMModel."""
    n = mesh.shape[axis]
    base = WavLMModel(cfg)
    x = base.apply({"params": params}, wav, pad_mask, method="prologue")
    B, T, D = x.shape

    Tp = ((T + n - 1) // n) * n
    mask_np = (jnp.ones((B, T), bool) if pad_mask is None
               else pad_mask.astype(bool))
    if Tp != T:
        x = jnp.pad(x, ((0, 0), (0, Tp - T), (0, 0)))
        mask_np = jnp.pad(mask_np, ((0, 0), (0, Tp - T)))

    sp_model = WavLMModel(dataclasses.replace(
        cfg, attention_impl="ring", ring_axis=axis))
    L = cfg.num_layers

    def stack(p, x_local, mask_local):
        out, hs = sp_model.apply(
            {"params": p}, x_local, mask_local, output_hidden_states,
            method="encoder_stack")
        return (out, hs) if output_hidden_states else out

    if output_hidden_states:
        out_specs = (P(None, axis), tuple(P(None, axis) for _ in range(L + 1)))
    else:
        out_specs = P(None, axis)
    result = jax.shard_map(
        stack, mesh=mesh,
        in_specs=(P(), P(None, axis), P(None, axis)),
        out_specs=out_specs,
    )(params, x, mask_np)

    if output_hidden_states:
        last, hs = result
        return {"last_hidden_state": last[:, :T],
                "hidden_states": tuple(h[:, :T] for h in hs)}
    return {"last_hidden_state": result[:, :T], "hidden_states": None}
