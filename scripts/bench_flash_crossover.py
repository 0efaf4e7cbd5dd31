#!/usr/bin/env python
"""Full-model WavLM einsum-vs-flash crossover sweep at mid lengths.

WavLMConfig.auto picks flash at T >= flash_min_frames; the current 1536
default is the midpoint of the measured T=499 (einsum wins) / T=2999
(flash wins) bracket. This sweep runs both impls at T ~ 1000/1500/2000
to place the crossover with data — update flash_min_frames (and its
config comment) from the output.

    python scripts/bench_flash_crossover.py
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import numpy as np, jax, jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/sdumc_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from sdumc_tpu.models.wavlm import WavLMConfig, WavLMModel  # noqa: E402

rng = np.random.default_rng(0)
print("device:", jax.devices()[0])

def run_cfg(impl, batch, T_target, dtype):
    # pick wav seconds so output_length lands near T_target
    cfg = WavLMConfig(attention_impl=impl, dtype=jnp.dtype(dtype))
    S = int((T_target + 1) * 320) + 80
    T = cfg.output_length(S)
    model = WavLMModel(cfg)
    wav = jnp.asarray(rng.normal(size=(batch, S)).astype(np.float32))
    mask = jnp.ones((batch, T), bool)
    shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), wav[:1], pad_mask=mask[:1]))["params"]
    leaves, treedef = jax.tree_util.tree_flatten(shapes)
    @jax.jit
    def make_params(key):
        ks = jax.random.split(key, len(leaves))
        return jax.tree_util.tree_unflatten(
            treedef, [0.02 * jax.random.normal(k, l.shape, jnp.dtype(dtype)) for k, l in zip(ks, leaves)])
    params = make_params(jax.random.PRNGKey(1))
    @jax.jit
    def fwd(p, w, m):
        # scalar reduce inside the program so the barrier below fetches one
        # float (block_until_ready returns early on axon — see bench.py)
        tap = model.apply({"params": p}, w.astype(jnp.dtype(dtype)), pad_mask=m,
                          output_hidden_states=True)["hidden_states"][-5]
        return jnp.sum(tap.astype(jnp.float32))
    float(fwd(params, wav, mask))  # compile + d2h fetch barrier
    reps = 8
    t0 = time.perf_counter()
    for _ in range(reps):
        o = fwd(params, wav, mask)
    float(o)  # d2h fetch barrier
    dt = (time.perf_counter() - t0) / reps
    print(f"{impl:7s} B={batch} T={T} {np.dtype(dtype).name}: {dt*1e3:8.2f} ms  {batch/dt:7.2f} clips/s", flush=True)
    return dt

for T_target in (999, 1499, 1999):
    for impl in ("einsum", "flash"):
        run_cfg(impl, 4, T_target, "bfloat16")
