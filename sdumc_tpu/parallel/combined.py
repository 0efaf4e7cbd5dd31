"""Combined tensor-parallel extractor + data-parallel fusion training.

One jit program on one ``(data, model)`` mesh: a frozen TP-sharded LLM
trunk embeds the batch's raw token ids (Megatron shardings from
parallel/sharding.py — the multi-device role accelerate.dispatch_model
plays for the reference's 7B extractors,
extract_text_embedding_huggingface.py:204-210), its layer-tap features
feed the text slot of the dual-view fusion step, and the fusion grads
all-reduce over the data axis. This is the end-to-end path the
tokenize-in-collate dataset variant (data/raw_text.py, reference
feat_data.py:263-365) exists for: no offline text features, the text tower
runs inside the train graph.

The LLM stays frozen (the reference never fine-tunes Vicuna), so grads
flow only into the fusion params; XLA overlaps the TP collectives of the
trunk with the DP all-reduce of the fusion backward where profitable.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp

from sdumc_tpu.core.config import LossConfig
from sdumc_tpu.train.step import dual_view_loss


def make_tp_dp_dual_step(lmodel, fusion_model, loss_cfg: LossConfig,
                         tap_layers: Sequence[int] = (-4, -3, -2, -1)):
    """Returns jitted (state, lparams, batch, rng) -> (state, metrics).

    ``batch`` carries audio/video/feat4 [B,T,D] + vals [B] (data-sharded),
    ``text_ids`` [B, Tt] int32, and ``t_max`` — the text entry of t_max is
    the token batch-max. ``lparams`` should be TP-sharded with
    parallel.sharding.llama_specs; the returned features inherit the data
    sharding of ``text_ids`` and the fusion step runs plain DP.
    """

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state, lparams, batch, rng):
        rng = jax.random.fold_in(rng, state.step)  # same as make_train_step
        out = lmodel.apply({"params": lparams}, input_ids=batch["text_ids"],
                           output_hidden_states=True)
        hs = out["hidden_states"]
        # the reference's gt-text tap: layers -4..-1 summed
        # (extract_text_embedding_huggingface.py:145)
        text = sum(hs[i] for i in tap_layers).astype(jnp.float32)
        text = jax.lax.stop_gradient(text)  # frozen extractor

        fbatch = dict(batch)
        fbatch.pop("text_ids")
        fbatch["text"] = text

        def loss_fn(params):
            return dual_view_loss(fusion_model, params, fbatch, loss_cfg,
                                  rng, deterministic=False)

        (_, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads=grads)
        return state, metrics

    return step
