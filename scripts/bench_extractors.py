#!/usr/bin/env python
"""Extractor-scale benchmarks on the real chip (VERDICT r1 item 1).

The round-1 numbers proved the tiny fusion net; the compute-heavy L1
stages are where the reference actually spends its GPU-days (SURVEY §3.4:
the feat4 stage — autoregressive 7B generate per clip — is "the by-far
slowest"). This measures, at real shapes:

  (a) WavLM-large audio extraction: MOSEI bulk regime (8 x 10 s wavs,
      T=499 frames) in f32 and bf16, plus the long-tail regime (60 s,
      T=2999) einsum vs flash attention — clips/s, frames/s, and achieved
      HBM GB/s + FLOP/s utilization from XLA cost analysis.
  (b) Vicuna-7B-*shaped* feat4 beam-4 decode (random bf16 weights —
      throughput depends only on shapes): clip-tokens/s vs gen_batch,
      with the does-7B-fit-on-one-v5e-chip answer recorded (weights
      13.7 GB bf16 + KV caches vs 16 GB HBM).

Writes ``bench_extractors.json`` at the repo root (bench.py folds it into
the driver JSON line) and prints it.

    python scripts/bench_extractors.py [--wavlm-only | --feat4-only]
"""

from __future__ import annotations

import argparse
import json
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

from sdumc_tpu.utils.roofline import PEAKS, program_cost as _cost  # noqa: E402

PEAK_FLOPS_BF16 = PEAKS["v5e"]["flops_bf16"]
PEAK_HBM_GBPS = PEAKS["v5e"]["hbm_gbps"]
OUT_PATH = os.path.join(REPO, "bench_extractors.json")


def bench_wavlm(reps: int = 12) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sdumc_tpu.models.wavlm import WavLMConfig, WavLMModel

    rng = np.random.default_rng(0)
    out: dict = {}

    def one(tag, *, batch, seconds, dtype, impl):
        cfg = WavLMConfig(attention_impl=impl, dtype=jnp.dtype(dtype))
        model = WavLMModel(cfg)
        S = seconds * 16000
        T = cfg.output_length(S)
        wav = jnp.asarray(rng.normal(size=(batch, S)).astype(np.float32))
        mask = jnp.ones((batch, T), bool)

        # random params at the real architecture size; dtype matches the
        # extractor's cast path (extract/audio.py)
        shapes = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0), wav[:1],
                               pad_mask=mask[:1]))["params"]
        leaves, treedef = jax.tree_util.tree_flatten(shapes)

        @jax.jit
        def make_params(key):
            ks = jax.random.split(key, len(leaves))
            return jax.tree_util.tree_unflatten(
                treedef,
                [0.02 * jax.random.normal(k, l.shape, jnp.dtype(dtype))
                 for k, l in zip(ks, leaves)])

        params = make_params(jax.random.PRNGKey(1))

        @jax.jit
        def run(p, w, m):
            hs = model.apply({"params": p}, w.astype(jnp.dtype(dtype)),
                             pad_mask=m, output_hidden_states=True)["hidden_states"]
            tap = hs[-5].astype(jnp.float32)  # the reference's layer tap
            # reduce to a scalar for the sync: fetching the full [B, T, D]
            # tap would time the dev tunnel (~10 MB/s), not the chip — a
            # colocated host DMAs the tap out faster than the next batch
            # computes
            return tap.mean()

        r = run(params, wav, mask)
        float(r)  # d2h fetch barrier (block_until_ready returns early on axon)
        flops, nbytes = _cost(run.lower(params, wav, mask).compile())
        t0 = time.perf_counter()
        outs = [run(params, wav, mask) for _ in range(reps)]
        float(outs[-1])  # programs run in launch order; last fetch syncs all
        dt = time.perf_counter() - t0
        per_call = dt / reps
        out[tag] = {
            "clips_per_sec": round(batch / per_call, 2),
            "frames_per_sec": round(batch * T / per_call, 1),
            "sec_per_call": round(per_call, 4),
            "T": T, "batch": batch, "dtype": dtype, "impl": impl,
            "flops_util_pct": round(100 * flops / per_call / PEAK_FLOPS_BF16, 1)
            if flops else None,
            "hbm_gbps": round(nbytes / per_call / 1e9, 1) if nbytes else None,
            "hbm_util_pct": round(100 * nbytes / per_call / 1e9 / PEAK_HBM_GBPS, 1)
            if nbytes else None,
        }
        return out[tag]

    # bulk MOSEI regime: ~10 s clips, batched
    one("bulk_f32", batch=8, seconds=10, dtype="float32", impl="einsum")
    one("bulk_bf16", batch=8, seconds=10, dtype="bfloat16", impl="einsum")
    # long-tail regime (the clips the reference deletes): flash vs einsum,
    # in both dtypes — the crossover is dtype-dependent (the kernel
    # computes f32 internally, so bf16 halves only the einsum path's
    # dominant [B,H,T,T] traffic)
    one("long_einsum_bf16", batch=1, seconds=60, dtype="bfloat16", impl="einsum")
    one("long_flash_bf16", batch=1, seconds=60, dtype="bfloat16", impl="flash")
    one("long_einsum_f32", batch=1, seconds=60, dtype="float32", impl="einsum")
    one("long_flash_f32", batch=1, seconds=60, dtype="float32", impl="flash")
    # batched long clips: einsum's [B, H, T, T] scores are ~4.6 GB here
    # (the regime that forced the extractor's frame-budget batch cap and
    # the reference's 51-clip deletion); flash runs the full batch in O(T)
    for tag, impl in (("long8_einsum_bf16", "einsum"), ("long8_flash_bf16", "flash")):
        try:
            one(tag, batch=8, seconds=60, dtype="bfloat16", impl=impl)
        except Exception as e:
            out[tag] = {"error": str(e).split("\n")[0][:160]}
    return out


def bench_feat4(batches=(1, 2, 4, 8, 16, 32), prompt: int = 128, new: int = 48,
                reps: int = 2, quant: str | None = None,
                kv_quant: str | None = None,
                profile_dir: str | None = None) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sdumc_tpu.models.generation import beam_generate_batched
    from sdumc_tpu.models.llama import LlamaConfig, LlamaForCausalLM

    # AUTO-layout AOT executables do NOT round-trip the persistent cache:
    # a cache-hit compiled1 can REQUIRE q/k_proj kernels at
    # major_to_minor=(0, 2, 1) while its .input_formats reports (0, 1, 2)
    # — device_put to the reported layout then dies with "compiled for
    # input layouts that disagree". Fresh-compile this section always; the
    # prior cache setting is restored in the finally below so sections that
    # run after a feat4 call don't silently pay full remote recompiles
    # (ADVICE r4).
    prior_cache = jax.config.jax_enable_compilation_cache
    jax.config.update("jax_enable_compilation_cache", False)
    try:
        return _bench_feat4_inner(batches, prompt, new, reps, quant,
                                  kv_quant, profile_dir)
    finally:
        jax.config.update("jax_enable_compilation_cache", prior_cache)


def _bench_feat4_inner(batches, prompt, new, reps, quant, kv_quant,
                       profile_dir):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sdumc_tpu.models.generation import beam_generate_batched
    from sdumc_tpu.models.llama import LlamaConfig, LlamaForCausalLM

    # scan_layers: one compiled layer body instead of 32 — the unrolled
    # 7B beam program OOMs the AOT compiler's HBM accounting; scan is also
    # the production layout (models/llama.py)
    cfg = LlamaConfig(max_position_embeddings=prompt + new, scan_layers=True,
                      quant=quant, kv_quant=kv_quant)
    model = LlamaForCausalLM(cfg)
    n_dense = cfg.num_layers * (4 * cfg.hidden_size ** 2
                                + 3 * cfg.hidden_size * cfg.intermediate_size)
    n_other = (cfg.vocab_size * cfg.hidden_size  # embed (lm_head is a Dense)
               + cfg.num_layers * 2 * cfg.hidden_size + cfg.hidden_size)
    n_lm_head = cfg.vocab_size * cfg.hidden_size
    if quant in ("int8", "w8a8"):
        weight_gb = ((n_dense + n_lm_head) * 1 + n_other * 2) / 1e9
    else:
        weight_gb = (n_dense + n_lm_head + n_other) * 2 / 1e9

    from jax.experimental.layout import Format, Layout

    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           input_ids=jnp.zeros((1, 8), jnp.int32)))["params"]
    flat, treedef = jax.tree_util.tree_flatten_with_path(shapes)
    paths = ["/".join(getattr(k, "key", str(k)) for k in p) for p, _ in flat]
    leaves = [l for _, l in flat]

    def bench_dtype(path, leaf):
        # quant kernels stay int8 (that's the point), their scales f32;
        # everything else benches in bf16 (init default is f32)
        if leaf.dtype == jnp.int8 or path.endswith("kernel_scale"):
            return leaf.dtype
        return jnp.bfloat16

    param_structs = jax.tree_util.tree_unflatten(
        treedef, [jax.ShapeDtypeStruct(l.shape, bench_dtype(p, l))
                  for p, l in zip(paths, leaves)])

    def gen_fn(p, pe, pl):
        apply_fn = lambda **kw: model.apply({"params": p}, **kw)  # noqa: E731
        embed_fn = lambda ids: p["model"]["embed_tokens"]["embedding"][ids]  # noqa: E731
        return beam_generate_batched(
            apply_fn, pe, cfg, embed_fn=embed_fn, prompt_len=pl,
            num_beams=4, max_new_tokens=new, eos_id=-1)  # eos never fires

    # AUTO input layouts: with default (row-major) param layouts XLA
    # relays the stacked q/k/v weights as ~1 GB temps INSIDE the program
    # (3 GB of copies — the difference between 7B fitting one v5e chip and
    # OOMing). Letting layout assignment pick the INPUT layouts moves the
    # relayout to parameter load time, where it belongs.
    gen1 = jax.jit(gen_fn, in_shardings=(Format(Layout.AUTO), None, None))
    pe1 = jax.ShapeDtypeStruct((batches[0], prompt, cfg.hidden_size), jnp.float32)
    pl1 = jax.ShapeDtypeStruct((batches[0],), jnp.int32)
    compiled1 = gen1.lower(param_structs, pe1, pl1).compile()
    param_formats = compiled1.input_formats[0][0]
    fmt_leaves = treedef.flatten_up_to(param_formats)

    # materialize the random weights leaf-by-leaf straight into the chosen
    # layout (building all 13.5 GB in default layout first and re-laying
    # would need 2x HBM); int8 leaves draw uniform levels + realistic scale
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
    params = jax.tree_util.tree_unflatten(treedef, laid)

    rng = np.random.default_rng(0)
    out: dict = {"shape": "7B (h4096 L32 MHA32, vocab 32k) "
                          + {"int8": "int8 weight-only",
                             "w8a8": "w8a8"}.get(quant, "bf16")
                          + (" + int8 KV cache" if kv_quant else ""),
                 "weight_gb": round(weight_gb, 2),
                 "prompt": prompt, "new_tokens": new, "per_batch": {}}
    # SPLIT KV cache (models/llama.py _split_attention): per cached token
    # per layer, K+V payload bytes + per-head f32 scales when int8. The
    # prompt part is stored per CLIP (beams share it); the generated part
    # per (clip, beam) row — memory AND per-step attention reads scale
    # with C*P + C*B*G instead of C*B*(P+G).
    kv_token_bytes = 2 * cfg.hidden_size * (
        1 if kv_quant == "int8" else 2) + (
        2 * cfg.num_heads * 4 if kv_quant == "int8" else 0)
    for C in batches:
        # the AUTO-lowered jit wrapper refuses concrete arrays — call its
        # compiled executable; later batch sizes pin the concrete formats
        gen = (compiled1 if C == batches[0] else
               jax.jit(gen_fn, in_shardings=(param_formats, None, None)))
        prompt_gb = cfg.num_layers * C * prompt * kv_token_bytes / 1e9
        gen_gb = cfg.num_layers * (C * 4) * new * kv_token_bytes / 1e9
        kv_gb = prompt_gb + gen_gb
        if weight_gb + kv_gb > 15.0:  # v5e HBM is 16 GB; leave headroom
            # a capacity limit is a RESULT, not an error: record why the
            # row is absent instead of attempting a compile whose OOM
            # surfaces as an opaque remote-compile INTERNAL fault
            out["per_batch"][str(C)] = {
                "skipped": f"does not fit: {round(weight_gb, 2)} GB weights"
                           f" + {round(kv_gb, 2)} GB beam-4 KV > 16 GB HBM",
                "kv_cache_gb": round(kv_gb, 2)}
            break
        def run_row():
            prompts = jnp.asarray(
                rng.normal(size=(C, prompt, cfg.hidden_size))
                .astype(np.float32) * 0.02)
            lens = jnp.full((C,), prompt - 5, jnp.int32)
            o = gen(params, prompts, lens)
            np.asarray(o["tokens"])  # sync
            do_trace = profile_dir and C == max(batches)
            if do_trace:
                jax.profiler.start_trace(profile_dir)
            t0 = time.perf_counter()
            for _ in range(reps):
                o = gen(params, prompts, lens)
                np.asarray(o["tokens"])
            dt = time.perf_counter() - t0
            if do_trace:
                jax.profiler.stop_trace()
            steps = int(np.asarray(o["n_steps"]).max())
            tps = reps * C * steps / dt
            # bytes-modeled decode roofline (VERDICT r4 item 4): every step
            # streams the full weights, reads the prompt cache once per
            # CLIP and the gen cache once per ROW, and the beam-ancestry
            # reorder moves the gen part twice (gather read + write).
            # Activations/logits (~40 MB at C=32) are omitted — the model
            # is a floor, so tps/bound is an upper bound on utilization.
            step_gb = weight_gb + prompt_gb + 3 * gen_gb
            bound_tps = C / (step_gb / PEAK_HBM_GBPS)
            out["per_batch"][str(C)] = {
                "clip_tokens_per_sec": round(tps, 2),
                "steps": steps, "sec_per_call": round(dt / reps, 3),
                "kv_cache_gb": round(kv_gb, 2),
                # decode streams the full weight set per step
                "weight_stream_gbps": round(weight_gb * steps * reps / dt, 1),
                "modeled_step_gb": round(step_gb, 2),
                "stream_bound_clip_tokens_per_sec": round(bound_tps, 1),
                "pct_of_stream_bound": round(100 * tps / bound_tps, 1),
            }
        try:
            try:
                run_row()
            except Exception as e:
                # transient remote-compile infra faults (INTERNAL/http) are
                # NOT data — retry once before recording anything
                if "INTERNAL" not in str(e) and "http" not in str(e):
                    raise
                print(f"gen_batch={C}: transient infra error, retrying once "
                      f"({str(e).splitlines()[0][:120]})")
                time.sleep(20)
                run_row()
        except Exception as e:  # OOM at this batch — the fit boundary
            msg = str(e).split("\n")[0][:200]
            out["per_batch"][str(C)] = {"error": msg, "kv_cache_gb": round(kv_gb, 2)}
            break
    fits = [c for c, v in out["per_batch"].items()
            if "clip_tokens_per_sec" in v]
    wlabel = quant or "bf16"
    out["fits_single_chip"] = (
        f"7B {wlabel} ({out['weight_gb']} GB) + beam-4 KV fits one 16 GB v5e chip "
        f"up to gen_batch={max(map(int, fits)) if fits else 0} "
        f"at {prompt + new} total positions" if fits else
        f"7B {wlabel} does not fit a single 16 GB v5e chip with beam-4 KV caches")
    best = max((v["clip_tokens_per_sec"]
                for v in out["per_batch"].values()
                if "clip_tokens_per_sec" in v),
               default=0.0)
    out["clip_tokens_per_sec_best"] = best
    return out


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--wavlm-only", action="store_true")
    p.add_argument("--feat4-only", action="store_true")
    p.add_argument("--feat4-int8-only", action="store_true",
                   help="refresh only the int8 decode section (reuses the "
                        "cached bf16/wavlm numbers in bench_extractors.json)")
    p.add_argument("--feat4-bf16-only", action="store_true",
                   help="refresh only the bf16 decode section")
    p.add_argument("--feat4-kv-only", action="store_true",
                   help="run the int8-KV-cache decode matrix (w8a8/int8 "
                        "weights x int8 KV at matched gen_batch)")
    args = p.parse_args(argv)

    import jax

    blob = {"device": str(jax.devices()[0])}
    if os.path.exists(OUT_PATH):
        with open(OUT_PATH) as f:
            blob.update(json.load(f))
    # retired variants must not survive a refresh via the merge above
    blob.pop("feat4_int4", None)
    if args.feat4_int8_only:
        blob["feat4_int8"] = bench_feat4(quant="int8")
        print(json.dumps({"feat4_int8": blob["feat4_int8"]}, indent=1))
        with open(OUT_PATH, "w") as f:
            json.dump(blob, f, indent=1)
        print(f"wrote {OUT_PATH}")
        return
    if args.feat4_bf16_only:
        blob["feat4"] = bench_feat4()
        print(json.dumps({"feat4": blob["feat4"]}, indent=1))
        with open(OUT_PATH, "w") as f:
            json.dump(blob, f, indent=1)
        print(f"wrote {OUT_PATH}")
        return
    if args.feat4_kv_only:
        # decode streams weights + KV cache every step; with w8a8 weights
        # (6.87 GB) the beam-4 gen_batch=8 KV cache (2.95 GB bf16) is the
        # next-largest stream — int8 KV halves it. (This matrix is what
        # retired int4: 144.7 clip-tok/s at batch 8 with int8 KV vs 212.2
        # for int8 weights — VERDICT r3 item 3.)
        for weights, batches in (("w8a8", (4, 8, 16, 32, 64)), ("int8", (4, 8, 16, 32))):
            key = f"feat4_{weights}_kv8"
            blob[key] = bench_feat4(batches=batches, quant=weights,
                                    kv_quant="int8")
            print(json.dumps({key: blob[key]}, indent=1))
            with open(OUT_PATH, "w") as f:  # checkpoint after each variant
                json.dump(blob, f, indent=1)
        print(f"wrote {OUT_PATH}")
        return
    def _save():  # checkpoint after every section: a mid-run tunnel fault
        with open(OUT_PATH, "w") as f:  # must not lose finished sections
            json.dump(blob, f, indent=1)

    if not args.feat4_only:
        blob["wavlm"] = bench_wavlm()
        print(json.dumps({"wavlm": blob["wavlm"]}, indent=1))
        _save()
    if not args.wavlm_only:
        blob["feat4"] = bench_feat4()
        print(json.dumps({"feat4": blob["feat4"]}, indent=1))
        _save()
        # weight-only int8 fast path (ops/quant.py): decode is weight-read
        # bound, so halved bytes is the headline lever; batches that OOM in
        # bf16 fit easily at ~7.1 GB of weights
        blob["feat4_int8"] = bench_feat4(quant="int8")
        _save()
        # w8a8: same weights, dynamic activation int8 + native int8 MXU
        # dots — no per-step dequant VPU work on the critical path
        blob["feat4_w8a8"] = bench_feat4(quant="w8a8")
        _save()
        # production combo: w8a8 weights + int8 KV cache (the two streams)
        blob["feat4_w8a8_kv8"] = bench_feat4(quant="w8a8", kv_quant="int8")
        print(json.dumps({"feat4_int8": blob["feat4_int8"]}, indent=1))
    _save()
    print(f"wrote {OUT_PATH}")


if __name__ == "__main__":
    main()
