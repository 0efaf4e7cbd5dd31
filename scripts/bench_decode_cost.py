#!/usr/bin/env python
"""XLA cost analysis of the single-token 7B decode step (diagnostic).

bench_decode_fwd.py measures the step at R=32 int8 at ~38 ms (257 GB/s
achieved vs the 9.8 GB nominal weights+KV stream -> 31% of v5e peak), and
the gen_batch sweep shows cost ~= 12 ms + 1.7 ms/row — something scales
with rows far above the per-row KV+FLOP budget (~0.2 ms/row). This script
asks the COMPILER what it thinks the program does: total bytes accessed,
FLOPs, and the largest temp allocations, at two row counts, so the
row-proportional leak (a materialized f32 buffer, an unfused convert, a
cache copy) shows up as a bytes delta.

    python scripts/bench_decode_cost.py [int8|w8a8|none] [rows=4,32]
"""
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/sdumc_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from sdumc_tpu.models.llama import LlamaConfig, LlamaForCausalLM, init_cache  # noqa: E402

QUANT = "int8"
ROWS = (4, 32)
for a in sys.argv[1:]:
    if a.startswith("rows="):
        ROWS = tuple(int(x) for x in a[5:].split(","))
    else:
        QUANT = a
quant = None if QUANT == "none" else QUANT
P, NEW = 128, 48
cfg = LlamaConfig(max_position_embeddings=P + NEW, scan_layers=True, quant=quant)
model = LlamaForCausalLM(cfg)
max_len = P + NEW

shapes = jax.eval_shape(
    lambda: model.init(jax.random.PRNGKey(0),
                       input_ids=jnp.zeros((1, 8), jnp.int32)))["params"]
params = jax.tree_util.tree_map(jnp.zeros_like, shapes)

from functools import partial  # noqa: E402


@partial(jax.jit, donate_argnums=(1,), static_argnums=(3,))
def step(p, caches, tok, R):
    emb = p["model"]["embed_tokens"]["embedding"][tok]
    pos = jnp.full((R, 1), P + 5, jnp.int32)
    slots = jnp.arange(max_len)[None, None, None, :]
    mask = jnp.where(slots <= pos[:, None, :, None], 0.0, -1e30)
    out = model.apply({"params": p}, inputs_embeds=emb, positions=pos,
                      attn_mask=mask, caches=caches,
                      output_hidden_states=True)
    return out["logits"], out["caches"]


for R in ROWS:
    caches = jax.eval_shape(lambda R=R: init_cache(cfg, R, max_len))
    tok = jax.ShapeDtypeStruct((R, 1), jnp.int32)
    compiled = step.lower(shapes, caches, tok, R).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    mem = compiled.memory_analysis()
    byt = ca.get("bytes accessed", 0.0)
    flops = ca.get("flops", 0.0)
    print(f"R={R:3d}: bytes accessed {byt/1e9:8.2f} GB   flops {flops/1e9:9.1f} G"
          f"   temp {mem.temp_size_in_bytes/1e9:6.2f} GB"
          f"   argout alias ok temp+out={(mem.temp_size_in_bytes+mem.output_size_in_bytes)/1e9:6.2f} GB",
          flush=True)
    # per-operand breakdown: the big "bytes accessedN{}" entries name the
    # operand slots XLA charges; dump everything > 200 MB
    big = {k: v for k, v in ca.items()
           if k.startswith("bytes accessed") and v > 2e8}
    for k in sorted(big, key=big.get, reverse=True)[:12]:
        print(f"   {k:28s} {big[k]/1e9:8.2f} GB")
