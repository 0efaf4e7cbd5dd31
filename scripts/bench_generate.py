#!/usr/bin/env python
"""Decode-engine bench: beam-4 clip-tokens/s vs --gen_batch on the TPU.

The feat4 stage is the reference pipeline's slowest (autoregressive 7B
``generate`` per clip, extract_wavlm_vicuna.py:245-258, strictly one clip at
a time). Our ``beam_generate_batched`` decodes C clips in lockstep; decode
is weight-read-bound so clip-tokens/s should scale ~linearly with C until
the MXU or HBM saturates. This script measures that curve on a mid-size
LLaMA config (random bf16 weights — throughput depends only on shapes).

    python scripts/bench_generate.py [--layers 8] [--hidden 2048] \
        [--batches 1,4,8] [--prompt 128] [--new 64]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

# persistent TPU-executable cache. NOTE: env-var config is latched before
# these lines run (a sitecustomize imports jax at interpreter startup), so
# the cache dir must go through jax.config, not os.environ.
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/sdumc_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--layers", type=int, default=8)
    p.add_argument("--hidden", type=int, default=2048)
    p.add_argument("--intermediate", type=int, default=5504)
    p.add_argument("--heads", type=int, default=16)
    p.add_argument("--batches", type=str, default="1,4,8")
    p.add_argument("--prompt", type=int, default=128)
    p.add_argument("--new", type=int, default=64)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--scan", action="store_true", default=False,
                   help="scan-over-layers trunk (the 7B-scale layout)")
    args = p.parse_args(argv)

    import numpy as np
    import jax
    import jax.numpy as jnp

    from sdumc_tpu.models.generation import beam_generate_batched
    from sdumc_tpu.models.llama import LlamaConfig, LlamaForCausalLM

    cfg = LlamaConfig(
        vocab_size=32000, hidden_size=args.hidden,
        intermediate_size=args.intermediate, num_layers=args.layers,
        num_heads=args.heads,
        max_position_embeddings=args.prompt + args.new,
        dtype=jnp.bfloat16, scan_layers=args.scan)
    model = LlamaForCausalLM(cfg)
    # random params directly in bf16: flax init would materialize f32
    # (2x the HBM — at 7B that alone overflows the chip)
    shapes = jax.eval_shape(lambda: model.init(
        jax.random.PRNGKey(0), input_ids=jnp.zeros((1, 8), jnp.int32)))["params"]
    leaves, treedef = jax.tree_util.tree_flatten(shapes)

    @jax.jit
    def make_params(key):
        ks = jax.random.split(key, len(leaves))
        return jax.tree_util.tree_unflatten(
            treedef, [0.02 * jax.random.normal(k, l.shape, jnp.bfloat16)
                      for k, l in zip(ks, leaves)])

    params = make_params(jax.random.PRNGKey(0))

    # params MUST be a jit argument, not a closure: closed-over arrays are
    # baked into the HLO as constants (gigabytes at 7B; remote-compile
    # tunnels reject the payload outright)
    def gen_fn(p, pe, pl, NEW):
        apply_fn = lambda **kw: model.apply({"params": p}, **kw)  # noqa: E731
        embed_fn = lambda ids: p["model"]["embed_tokens"]["embedding"][ids]  # noqa: E731
        return beam_generate_batched(
            apply_fn, pe, cfg, embed_fn=embed_fn, prompt_len=pl,
            num_beams=4, max_new_tokens=NEW, eos_id=-1)  # eos never fires

    rng = np.random.default_rng(0)
    P, NEW = args.prompt, args.new
    for C in (int(x) for x in args.batches.split(",")):
        prompts = jnp.asarray(
            rng.normal(size=(C, P, cfg.hidden_size)).astype(np.float32) * 0.02)
        lens = jnp.full((C,), P - 5, jnp.int32)
        gen = jax.jit(lambda p, pe, pl: gen_fn(p, pe, pl, NEW))
        # sync via a device->host fetch of the tokens — equivalent to
        # block_until_ready per JAX semantics; the fetched array is also
        # what a real extractor run would pull to host
        out = gen(params, prompts, lens)
        np.asarray(out["tokens"])
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = gen(params, prompts, lens)
            np.asarray(out["tokens"])
        dt = time.perf_counter() - t0
        steps = int(np.asarray(out["n_steps"]).max())
        print(f"gen_batch={C}: {args.reps * C * steps / dt:.1f} clip-tokens/s "
              f"({steps} steps, {dt / args.reps:.2f}s/call)")


if __name__ == "__main__":
    main()
