#!/usr/bin/env python
"""Standalone single-token decode forward vs the weight+KV stream bound.

Times ONE 7B decode-step forward (donated caches chained through the
reps, single fetch at the end — see the axon sync caveats in
bench_decode_parts.py) at row counts 4..32, printing achieved GB/s
against the weights+KV bytes the step must stream. Isolates the model
forward from the beam machinery that scripts/bench_decode_parts.py
ablates.

    python scripts/bench_decode_fwd.py [int8|w8a8|none]
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import numpy as np, jax, jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/sdumc_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from sdumc_tpu.models.llama import LlamaConfig, LlamaForCausalLM, init_cache  # noqa: E402

QUANT = "int8"
# "unroll" anywhere in argv: unrolled trunk instead of scan-over-layers —
# isolates the cost of the scan's per-layer dynamic-slice of the stacked
# weights (compile is ~32x slower; measurement identical otherwise)
SCAN = "unroll" not in sys.argv
# optional "rows=4,32" to trim the sweep (unrolled compiles are pricey)
ROWS = (4, 8, 16, 32)
for a in sys.argv[1:]:
    if a.startswith("rows="):
        ROWS = tuple(int(x) for x in a[5:].split(","))
    elif a != "unroll":
        QUANT = a
quant = None if QUANT == "none" else QUANT
P, NEW = 128, 48
cfg = LlamaConfig(max_position_embeddings=P + NEW, scan_layers=SCAN, quant=quant)
model = LlamaForCausalLM(cfg)
max_len = P + NEW

shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), input_ids=jnp.zeros((1, 8), jnp.int32)))["params"]
flat, treedef = jax.tree_util.tree_flatten_with_path(shapes)
paths = ["/".join(getattr(k, "key", str(k)) for k in p_) for p_, _ in flat]
leaves = [l for _, l in flat]
key = jax.random.PRNGKey(2)
laid = []
for path, l in zip(paths, leaves):
    key, sub = jax.random.split(key)
    if l.dtype == jnp.int8:
        arr = jax.jit(lambda k, s=l.shape: jax.random.randint(k, s, -127, 128, jnp.int32).astype(jnp.int8))(sub)
    elif path.endswith("kernel_scale"):
        arr = jnp.full(l.shape, 0.02 / 127, jnp.float32)
    else:
        arr = jax.jit(lambda k, s=l.shape: 0.02 * jax.random.normal(k, s, jnp.bfloat16))(sub)
    laid.append(arr)
params = jax.tree_util.tree_unflatten(treedef, laid)
print("params built", flush=True)

from functools import partial

@partial(jax.jit, donate_argnums=(1,), static_argnums=(3,))
def step(p, caches, tok, R):
    emb = p["model"]["embed_tokens"]["embedding"][tok]          # [R,1,D]
    pos = jnp.full((R, 1), P + 5, jnp.int32)
    slots = jnp.arange(max_len)[None, None, None, :]
    mask = jnp.where(slots <= pos[:, None, :, None], 0.0, -1e30)
    out = model.apply({"params": p}, inputs_embeds=emb, positions=pos,
                      attn_mask=mask, caches=caches,
                      output_hidden_states=True)
    return out["logits"], out["caches"]

for R in ROWS:
    caches = init_cache(cfg, R, max_len)
    tok = jnp.zeros((R, 1), jnp.int32)
    logits, caches = step(params, caches, tok, R)
    np.asarray(logits[0, 0, :8])
    reps = 20
    t0 = time.perf_counter()
    for _ in range(reps):
        # no per-rep fetch: the donated cache chain serializes the steps
        # on-device; one fetch at the end flushes the pipeline
        logits, caches = step(params, caches, tok, R)
    np.asarray(logits[0, 0, :8])
    dt = (time.perf_counter() - t0) / reps
    # weight stream: sum the actual param bytes
    wgb = sum(l.size * l.dtype.itemsize for l in leaves) / 1e9
    kvgb = 32 * 2 * R * max_len * 4096 * 2 / 1e9
    print(f"R={R:3d}: {dt*1e3:7.2f} ms/step  weights+kv {(wgb+kvgb):5.2f} GB "
          f"-> {(wgb+kvgb)/dt:6.0f} GB/s achieved", flush=True)
