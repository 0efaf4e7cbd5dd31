#!/usr/bin/env python
"""In-model A/B of flash config candidates at the long8 regime (B=8, 60 s
clips, T=2999, bf16 wavlm-large): the kernel-only sweep
(bench_flash_tune.py) rebuilds the bias-tile table per call, which biases
it toward small blocks — the encoder builds the table once per clip and
shares it across 24 layers, so the production winner must be picked
in-model. Prints clips/s per (flash_block, flash_head_block) candidate.

    python scripts/bench_flash_inmodel.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/sdumc_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from sdumc_tpu.models.wavlm import WavLMConfig, WavLMModel  # noqa: E402

B, SECONDS, REPS = 8, 60, 8
rng = np.random.default_rng(0)

CANDIDATES = [  # (flash_block, flash_head_block) — e2=0 everywhere (slower
    (256, 0),   # in every kernel sweep row); 0 heads = all-H packing
    (256, 8),
    (512, 4),
    (512, 8),
]

wav_np = rng.normal(size=(B, SECONDS * 16000)).astype(np.float32)
results = {}
for blk, hb in CANDIDATES:
    cfg = WavLMConfig(attention_impl="flash", dtype=jnp.bfloat16,
                      flash_block=blk, flash_head_block=hb,
                      flash_exp_base2=False)
    model = WavLMModel(cfg)
    T = cfg.output_length(wav_np.shape[1])
    wav = jnp.asarray(wav_np)
    mask = jnp.ones((B, T), bool)
    shapes = jax.eval_shape(
        lambda m=model, w=wav, k=mask: m.init(
            jax.random.PRNGKey(0), w[:1], pad_mask=k[:1]))["params"]
    leaves, treedef = jax.tree_util.tree_flatten(shapes)

    @jax.jit
    def make_params(key, _leaves=tuple(l.shape for l in leaves),
                    _td=treedef):
        ks = jax.random.split(key, len(_leaves))
        return jax.tree_util.tree_unflatten(
            _td, [0.02 * jax.random.normal(k, s, jnp.bfloat16)
                  for k, s in zip(ks, _leaves)])

    params = make_params(jax.random.PRNGKey(1))

    @jax.jit
    def run(p, w, m, _model=model):
        hs = _model.apply({"params": p}, w.astype(jnp.bfloat16),
                          pad_mask=m, output_hidden_states=True)[
            "hidden_states"]
        return hs[-5].astype(jnp.float32).mean()

    try:
        float(run(params, wav, mask))  # compile + fetch barrier
    except Exception as exc:
        print(f"blk={blk} hb={hb or 'all'}: FAIL {str(exc)[:100]}")
        continue
    t0 = time.perf_counter()
    outs = [run(params, wav, mask) for _ in range(REPS)]
    float(outs[-1])
    per_call = (time.perf_counter() - t0) / REPS
    results[(blk, hb)] = per_call
    print(f"blk={blk} hb={hb or 'all'}: {per_call*1e3:8.1f} ms  "
          f"{B/per_call:6.2f} clips/s")

if results:
    best = min(results, key=results.get)
    print(f"BEST: blk={best[0]} hb={best[1] or 'all'} "
          f"{B/results[best]:.2f} clips/s")
