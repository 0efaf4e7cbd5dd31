"""Pipeline parallelism (GPipe schedule) over the scan-layers LLaMA trunk.

The reference shards its 7B–13B extractor LLMs with
``accelerate.dispatch_model`` (extract_text_embedding_huggingface.py:204-210)
— layer-wise placement across GPUs where each forward hops device to device
serially. The TPU-native equivalent is a real pipeline: the stacked
[num_layers, ...] parameter tree is sharded over a ``stage`` mesh axis
(num_layers/S layers resident per device), the batch is split into
microbatches, and activations flow stage-to-stage over ICI via
``lax.ppermute`` on a GPipe schedule — S + M - 1 ticks for M microbatches,
every stage busy except the fill/drain bubble. One ``shard_map``-wrapped
jit; XLA sees static shapes throughout.

Scope: the full-sequence forward (the gt-text embedding pass and prompt
prefill). Autoregressive beam decode wants tensor parallelism instead
(parallel/sharding.py) — a 1-token step would leave S-1 stages idle.

Use tensor parallelism when the model fits per-chip memory after head
sharding and the interconnect is fast (ICI); pipeline when layers must be
split across slower boundaries (DCN multi-host) or TP's per-layer
collectives dominate. Both compose with data parallelism over the
remaining mesh axes.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def pipeline_apply(
    mesh: Mesh,
    layer_fn: Callable[[Any, jnp.ndarray, Any], jnp.ndarray],
    stacked_params: Any,
    x: jnp.ndarray,
    extras: Any = (),
    *,
    n_microbatches: int,
    axis_name: str = "stage",
    collect_local_hidden: bool = False,
):
    """Run ``x`` through all L stacked layers, pipelined over the mesh's
    ``axis_name`` axis.

    Args:
      layer_fn: ``(layer_params, h, extras) -> h`` for ONE layer (leaves of
        ``layer_params`` have no leading layer axis).
      stacked_params: pytree with leading ``[L, ...]`` on every leaf
        (the scan-layers layout, models/llama.py); L % n_stages == 0.
      x: ``[B, ...]`` replicated input; B % n_microbatches == 0.
      extras: replicated side inputs forwarded to every ``layer_fn`` call
        (positions, masks, ...). Must not depend on the microbatch.
      collect_local_hidden: also return the LAST stage's per-layer hidden
        states ``[L/S, B, ...]`` — with S stages over L layers the final
        L/S layers live on the last stage, so the reference's −4..−1 /−3
        hidden-state taps (extract_text_embedding_huggingface.py:145) come
        out of the pipeline for free when L/S >= 4.

    Returns ``y [B, ...]`` (== sequential application of all L layers),
    or ``(y, local_hidden)`` with ``collect_local_hidden``.
    """
    S = mesh.shape[axis_name]
    M = n_microbatches
    B = x.shape[0]
    assert B % M == 0, (B, M)
    mb = B // M

    L = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    assert L % S == 0, (L, S)

    def body(local_params, x_full, extras):
        s = jax.lax.axis_index(axis_name)
        xm = x_full.reshape((M, mb) + x_full.shape[1:])

        def local_stack(h):
            def step(h, lp):
                h = layer_fn(lp, h, extras)
                return h, (h if collect_local_hidden else None)

            return jax.lax.scan(step, h, local_params)

        out0 = jnp.zeros_like(xm)
        hid0 = (jnp.zeros((L // S, M) + xm.shape[1:], x_full.dtype)
                if collect_local_hidden else None)
        h0 = jnp.zeros_like(xm[0])
        # make the loop state device-varying over the stage axis up front
        # (shard_map type system: the tick body mixes axis_index-dependent
        # values into the carry, so the initial carry must be varying too)
        out0, hid0, h0 = jax.tree_util.tree_map(
            lambda a: jax.lax.pcast(a, (axis_name,), to="varying"),
            (out0, hid0, h0))

        def tick(t, carry):
            h_cur, out, hid = carry
            # stage 0 pulls microbatch t from the input queue (clamped —
            # drain ticks recompute the last microbatch, results unused)
            feed = jax.lax.dynamic_index_in_dim(
                xm, jnp.clip(t, 0, M - 1), keepdims=False)
            inp = jnp.where(s == 0, feed, h_cur)
            y, ys = local_stack(inp)
            # the microbatch the LAST stage just finished
            idx = t - (S - 1)
            write = jnp.logical_and(s == S - 1,
                                    jnp.logical_and(idx >= 0, idx < M))
            safe = jnp.clip(idx, 0, M - 1)
            cur = jax.lax.dynamic_index_in_dim(out, safe, keepdims=False)
            out = jax.lax.dynamic_update_index_in_dim(
                out, jnp.where(write, y, cur), safe, 0)
            if collect_local_hidden:
                cur_h = jax.lax.dynamic_index_in_dim(hid, safe, 1,
                                                     keepdims=False)
                hid = jax.lax.dynamic_update_index_in_dim(
                    hid, jnp.where(write, ys, cur_h), safe, 1)
            # hand activations to the next stage (last stage's output is
            # final, not forwarded; stage 0 receives zeros, reads the queue)
            h_nxt = jax.lax.ppermute(
                y, axis_name, [(i, i + 1) for i in range(S - 1)])
            return h_nxt, out, hid

        _, out, hid = jax.lax.fori_loop(0, S + M - 1, tick, (h0, out0, hid0))
        # only the last stage holds real outputs; one-hot psum replicates
        mask = (s == S - 1).astype(out.dtype)
        y_full = jax.lax.psum(out * mask, axis_name)
        y_full = y_full.reshape((B,) + x_full.shape[1:])
        if collect_local_hidden:
            hid_full = jax.lax.psum(hid * mask.astype(hid.dtype), axis_name)
            hid_full = hid_full.reshape((L // S, B) + xm.shape[2:])
            return y_full, hid_full
        return y_full

    param_specs = jax.tree_util.tree_map(lambda _: P(axis_name), stacked_params)
    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(param_specs, P(), P()),
        out_specs=(P(), P()) if collect_local_hidden else P(),
    )(stacked_params, x, extras)


def stage_sharding(mesh: Mesh, axis_name: str = "stage") -> NamedSharding:
    """Sharding for stacked layer params: leading layer axis over stages."""
    return NamedSharding(mesh, P(axis_name))


def llama_pp_forward(
    model,
    params: Any,
    mesh: Mesh,
    *,
    inputs_embeds: Optional[jnp.ndarray] = None,
    input_ids: Optional[jnp.ndarray] = None,
    n_microbatches: int = 4,
    axis_name: str = "stage",
    collect_taps: int = 0,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Full-sequence LLaMA forward with the trunk pipelined over
    ``axis_name``. Returns ``(last_hidden_state, taps)`` where ``taps``
    is the final ``collect_taps`` pre-norm layer outputs ``[K, B, T, D]``
    (requires collect_taps <= num_layers / n_stages; the HF convention's
    very last tap is post-final-norm — callers that sum −4..−1 should
    replace taps[-1] with the returned last_hidden_state, matching
    models/llama.py's hidden_states contract).

    ``model`` is a ``LlamaModel`` (scan_layers=True); ``params`` its
    stacked param tree. Embed + final norm are tiny and run replicated.
    """
    from sdumc_tpu.models.llama import LlamaLayer, RMSNorm  # noqa: F401

    cfg = model.cfg
    assert cfg.scan_layers, "pipeline needs the stacked scan-layers layout"
    params = params.get("model", params)  # LlamaForCausalLM nests the trunk
    if inputs_embeds is None:
        emb = params["embed_tokens"]["embedding"]
        inputs_embeds = emb[input_ids].astype(cfg.dtype)
    x = inputs_embeds.astype(cfg.dtype)
    B, T, _ = x.shape
    positions = jnp.broadcast_to(jnp.arange(T)[None], (x.shape[0] // n_microbatches, T))
    causal = jnp.tril(jnp.ones((T, T), bool))
    mask = jnp.where(causal, 0.0, -1e30)[None, None]

    layer = LlamaLayer(cfg)

    def layer_fn(lp, h, extras):
        positions, mask = extras
        out, _ = layer.apply({"params": lp}, h, positions, mask, None)
        return out

    stacked = params["layers"]
    S = mesh.shape[axis_name]
    if collect_taps:
        assert collect_taps <= cfg.num_layers // S, (collect_taps, S)
        y, hid = pipeline_apply(
            mesh, layer_fn, stacked, x, (positions, mask),
            n_microbatches=n_microbatches, axis_name=axis_name,
            collect_local_hidden=True)
        taps = hid[-collect_taps:]
    else:
        y = pipeline_apply(
            mesh, layer_fn, stacked, x, (positions, mask),
            n_microbatches=n_microbatches, axis_name=axis_name)
        taps = None

    # final norm, replicated (tiny)
    norm = RMSNorm(cfg.rms_eps)
    last = norm.apply({"params": params["norm"]}, y)
    return last, taps
