#!/usr/bin/env python
"""Decode-step cost breakdown for the 7B feat4 beam path (diagnostic).

bench_extractors.py measures ~63 ms/decode-step at gen_batch=8 int8 where
the weight+KV stream bound is ~19 ms — this script attributes the gap by
timing ablated variants of the SAME compiled beam program:

  full        the production beam_generate_batched
  no_gather   beam ancestry gather of the KV caches replaced with identity
              (numerics wrong, timing right) — isolates the per-step
              full-cache permutation (read+write of every KV byte)
  no_taps     output_hidden_states off, taps skipped — isolates the
              per-step hidden-state stack + tap write
  greedy32    greedy decode over C*beams independent rows — the floor a
              beam-free engine would hit (no top_k/candidate machinery)

    python scripts/bench_decode_parts.py [--quant int8] [--batch 8]
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
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--quant", default="int8", choices=["int8", "w8a8", "none"])
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--prompt", type=int, default=128)
    p.add_argument("--new", type=int, default=48)
    p.add_argument("--tiny", action="store_true",
                   help="tiny config on CPU — logic smoke, not a benchmark")
    args = p.parse_args(argv)

    if args.tiny:
        import jax as _jax
        _jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental.layout import Format, Layout

    from sdumc_tpu.models import generation
    from sdumc_tpu.models.llama import LlamaConfig, LlamaForCausalLM

    quant = None if args.quant == "none" else args.quant
    C, prompt, new = args.batch, args.prompt, args.new
    if args.tiny:
        cfg = LlamaConfig.tiny(max_position_embeddings=prompt + new,
                               scan_layers=True, quant=quant)
    else:
        cfg = LlamaConfig(max_position_embeddings=prompt + new,
                          scan_layers=True, quant=quant)
    model = LlamaForCausalLM(cfg)

    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           input_ids=jnp.zeros((1, 8), jnp.int32)))["params"]
    flat, treedef = jax.tree_util.tree_flatten_with_path(shapes)
    paths = ["/".join(getattr(k, "key", str(k)) for k in p_) for p_, _ in flat]
    leaves = [l for _, l in flat]

    def bench_dtype(path, leaf):
        if leaf.dtype == jnp.int8 or path.endswith("kernel_scale"):
            return leaf.dtype
        return jnp.bfloat16

    param_structs = jax.tree_util.tree_unflatten(
        treedef, [jax.ShapeDtypeStruct(l.shape, bench_dtype(p_, l))
                  for p_, l in zip(paths, leaves)])

    def gen_fn(p_, pe, pl):
        apply_fn = lambda **kw: model.apply({"params": p_}, **kw)  # noqa: E731
        embed_fn = lambda ids: p_["model"]["embed_tokens"]["embedding"][ids]  # noqa: E731
        return generation.beam_generate_batched(
            apply_fn, pe, cfg, embed_fn=embed_fn, prompt_len=pl,
            num_beams=4, max_new_tokens=new, eos_id=-1)

    def greedy_fn(p_, pe):
        # C*4 independent greedy rows: forward shape identical to the beam
        # step (32 rows), zero beam machinery, no cache gather
        apply_fn = lambda **kw: model.apply({"params": p_}, **kw)  # noqa: E731
        embed_fn = lambda ids: p_["model"]["embed_tokens"]["embedding"][ids]  # noqa: E731
        single = lambda pe1: generation.greedy_generate(
            apply_fn, pe1, cfg, embed_fn=embed_fn, max_new_tokens=new,
            eos_id=-1)
        return jax.vmap(single)(pe[:, None])

    # AUTO input layouts (see bench_extractors.py) — compile the full
    # program first, then pin every variant to the same param formats
    gen1 = jax.jit(gen_fn, in_shardings=(Format(Layout.AUTO), None, None))
    pe_s = jax.ShapeDtypeStruct((C, prompt, cfg.hidden_size), jnp.float32)
    pl_s = jax.ShapeDtypeStruct((C,), jnp.int32)
    t0 = time.perf_counter()
    compiled_full = gen1.lower(param_structs, pe_s, pl_s).compile()
    print(f"compile full: {time.perf_counter() - t0:.0f}s", flush=True)
    param_formats = compiled_full.input_formats[0][0]
    fmt_leaves = treedef.flatten_up_to(param_formats)

    key = jax.random.PRNGKey(2)
    laid = []
    for path, l, fmt in zip(paths, leaves, fmt_leaves):
        key, sub = jax.random.split(key)
        if l.dtype == jnp.int8:
            make = lambda k, shape=l.shape: jax.random.randint(  # noqa: E731
                k, shape, -127, 128, jnp.int32).astype(jnp.int8)
        elif path.endswith("kernel_scale"):
            make = lambda k, shape=l.shape: jnp.full(  # noqa: E731
                shape, 0.02 / 127, jnp.float32)
        else:
            make = lambda k, shape=l.shape: 0.02 * jax.random.normal(  # noqa: E731
                k, shape, jnp.bfloat16)
        arr = jax.jit(make)(sub)
        laid.append(jax.device_put(arr, fmt))
        arr.delete()

    # On this stack device_put occasionally leaves a leaf in its default
    # layout despite the requested Format (observed on stacked int8
    # kernels); pinning jits to requested-but-not-applied formats then
    # fails the jit arg check, and pinning to actual-but-default formats
    # buys a per-call in-program relayout that contaminates the ablation
    # deltas. Force strays through a jitted identity with out_shardings
    # (XLA relayout, reliable where the transfer path is not).
    for i, (path, want) in enumerate(zip(paths, fmt_leaves)):
        got = laid[i].format.layout
        if got.major_to_minor != want.layout.major_to_minor:
            old = laid[i]
            laid[i] = jax.jit(lambda a: a, out_shardings=want)(old)
            if laid[i].format.layout.major_to_minor != \
                    want.layout.major_to_minor:
                # Both relayout paths no-op for this leaf (observed on the
                # stacked int8 q/k quant kernels) — keep the default
                # layout; the pin below uses ACTUAL formats so every
                # variant still compiles against identical inputs and the
                # ablation deltas stay meaningful (absolute ms/step runs
                # ~15% above the AUTO-executable production number).
                laid[i].delete()
                laid[i] = old
                print(f"stray layout {path}: requested "
                      f"{want.layout.major_to_minor}, relayout no-ops — "
                      f"keeping {got.major_to_minor}", flush=True)
            else:
                old.delete()
    param_formats = jax.tree_util.tree_unflatten(
        treedef, [a.format for a in laid])
    params = jax.tree_util.tree_unflatten(treedef, laid)

    rng = np.random.default_rng(0)
    prompts = jnp.asarray(
        rng.normal(size=(C, prompt, cfg.hidden_size)).astype(np.float32) * 0.02)
    lens = jnp.full((C,), prompt - 5, jnp.int32)

    def run(label, fn, *a, reps=3):
        # sync by FETCHING tokens+taps (bench_extractors.py convention —
        # block_until_ready on this remote-execution stack has produced
        # bogus instant timings for AOT executables)
        o = fn(*a)
        np.asarray(o["tokens"]), np.asarray(o["taps"])
        t0 = time.perf_counter()
        for _ in range(reps):
            o = fn(*a)
            np.asarray(o["tokens"]), np.asarray(o["taps"])
        dt = (time.perf_counter() - t0) / reps
        steps = int(np.asarray(o["n_steps"]).max())
        print(f"{label:10s}: {dt:7.3f} s/call  {dt / steps * 1e3:7.2f} ms/step"
              f"  ({steps} steps)", flush=True)
        return dt / steps

    full_jit = jax.jit(gen_fn, in_shardings=(param_formats, None, None))
    full = run("full", full_jit, params, prompts, lens)

    # ---- old_vmap: the round-2-era engine shape — vmap of the single-clip
    # program. vmap rewrites the while_loop to per-element selects over
    # EVERY leaf, including the KV caches (the overhead the native batched
    # engine removes).
    def gen_fn_vmap(p_, pe, pl):
        apply_fn = lambda **kw: model.apply({"params": p_}, **kw)  # noqa: E731
        embed_fn = lambda ids: p_["model"]["embed_tokens"]["embedding"][ids]  # noqa: E731
        single = lambda pe1, pl1: generation.beam_generate(
            apply_fn, pe1, cfg, embed_fn=embed_fn, prompt_len=pl1,
            num_beams=4, max_new_tokens=new, eos_id=-1)
        return jax.vmap(single)(pe[:, None], pl)

    ov = jax.jit(gen_fn_vmap, in_shardings=(param_formats, None, None))
    oldv = run("old_vmap", ov, params, prompts, lens)

    # ---- no_gather: identity ancestry (timing-only ablation)
    orig_gather = generation._gather_caches
    generation._gather_caches = lambda caches, idx: caches
    try:
        ng = jax.jit(gen_fn, in_shardings=(param_formats, None, None))
        nog = run("no_gather", ng, params, prompts, lens)
    finally:
        generation._gather_caches = orig_gather

    # ---- no_hidden: drop the per-step tap accumulation entirely (the
    # production path now computes a running tap SUM in the scan carry —
    # LlamaModel.tap_sum_layers — instead of stacking all layers); the tap
    # write itself stays, fed from zeros
    def gen_fn_nohs(p_, pe, pl):
        apply_fn0 = lambda **kw: model.apply({"params": p_}, **kw)  # noqa: E731

        def apply_fn(**kw):
            R = kw["inputs_embeds"].shape[0]
            kw.pop("tap_sum_layers", None)
            out = apply_fn0(**kw)
            out["tap_sum"] = jnp.zeros((R, 1, cfg.hidden_size), jnp.float32)
            return out

        embed_fn = lambda ids: p_["model"]["embed_tokens"]["embedding"][ids]  # noqa: E731
        return generation.beam_generate_batched(
            apply_fn, pe, cfg, embed_fn=embed_fn, prompt_len=pl,
            num_beams=4, max_new_tokens=new, eos_id=-1)

    nt = jax.jit(gen_fn_nohs, in_shardings=(param_formats, None, None))
    noh = run("no_hidden", nt, params, prompts, lens)

    # ---- greedy floor (32 independent rows, no beam machinery)
    gr = jax.jit(greedy_fn, in_shardings=(param_formats, None))
    prompts32 = jnp.asarray(
        rng.normal(size=(C * 4, prompt, cfg.hidden_size)).astype(np.float32)
        * 0.02)
    gfloor = run("greedy32", gr, params, prompts32)

    print(f"\nper-step attribution (ms): full {full*1e3:.1f} | "
          f"old_vmap {oldv*1e3:.1f} | "
          f"gather {(full-nog)*1e3:.1f} | hidden/taps {(full-noh)*1e3:.1f} | "
          f"greedy-floor {gfloor*1e3:.1f}")


if __name__ == "__main__":
    main()
