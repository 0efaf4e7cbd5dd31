#!/usr/bin/env python
"""Per-op TPU profile of the production train + eval steps.

Runs the exact programs bench.py times (dual-view distillation train step,
eval step; bf16 features) under ``jax.profiler``, parses the captured
perfetto trace (``*.trace.json.gz`` — plain json+gzip, no tensorboard
needed) and writes a checked-in artifact:

    profiles/step_ops.json   — per-op table: total us, calls, % device time
    profiles/step_ops.md     — human-readable top table per program

The point (VERDICT r3 item 2): the roofline says train runs at 7.8% MFU /
~41% HBM — neither a bound. This artifact shows op-by-op where the step's
device time actually goes (big fusions = HBM-bound elementwise/reduce work,
dots = MXU work, copies/transposes = layout overhead) so the throughput
analysis in bench.py cites measured per-op numbers, not prose.

    python scripts/profile_train.py [--epochs 3]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/sdumc_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _device_op_events(trace_dir: str):
    """Aggregate XLA-op events from the newest perfetto trace under
    ``trace_dir``. Returns {program_scope: {op_name: [total_us, calls]}}
    using the device-side 'XLA Ops' thread (one event per executed op)."""
    paths = sorted(glob.glob(os.path.join(
        trace_dir, "plugins", "profile", "*", "*.trace.json.gz")))
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {trace_dir}")
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    # pid/tid metadata: find device-side op threads
    names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") in ("process_name",
                                                    "thread_name"):
            key = (e["pid"], e.get("tid")) if e["name"] == "thread_name" \
                else (e["pid"], None)
            names[key] = e["args"].get("name", "")
    op_tids = {
        (pid, tid) for (pid, tid), n in names.items()
        if tid is not None and "XLA Ops" in n
        and "TPU" in names.get((pid, None), "")
    }
    if not op_tids:  # CPU backend traces name tracks differently
        op_tids = {(pid, tid) for (pid, tid), n in names.items()
                   if tid is not None and "XLA Ops" in n}
    ops: dict = {}
    for e in events:
        if e.get("ph") != "X" or (e.get("pid"), e.get("tid")) not in op_tids:
            continue
        # args.run_id/program_id group ops by executed program; the op name
        # is the HLO instruction (fusion.N, dot.N, copy.N ...)
        name = e["name"]
        slot = ops.setdefault(name, [0.0, 0])
        slot[0] += float(e.get("dur", 0.0))
        slot[1] += 1
    return ops


def _classify(op: str) -> str:
    base = op.split(".")[0].split("-")[0]
    if base in ("fusion", "loop_fusion", "input_fusion", "output_fusion"):
        return "fusion (elementwise/reduce — HBM-bound)"
    if base in ("dot", "convolution", "cudnn"):
        return "dot/conv (MXU)"
    if base in ("copy", "transpose", "bitcast", "reshape"):
        return "copy/layout"
    if "all-reduce" in op or "all-gather" in op or "collective" in op:
        return "collective"
    if base in ("dynamic", "dynamic_update_slice", "slice", "gather",
                "scatter", "select"):
        return "slice/gather/scatter"
    return base


def op_table(tag: str, trace_dir: str, wall: float, epochs: int) -> dict:
    """Aggregate a captured trace into the per-op artifact dict."""
    ops = _device_op_events(trace_dir)
    total = sum(v[0] for v in ops.values())
    rows = sorted(
        ({"op": k, "total_us": round(v[0], 1), "calls": v[1],
          "pct_device": round(100 * v[0] / total, 2),
          "class": _classify(k)} for k, v in ops.items()),
        key=lambda r: -r["total_us"])
    by_class: dict = {}
    for r in rows:
        c = by_class.setdefault(r["class"], [0.0, 0])
        c[0] += r["total_us"]
        c[1] += r["calls"]
    return {
        "tag": tag,
        "epochs": epochs,
        "wall_s": round(wall, 3),
        "device_total_ms": round(total / 1e3, 2),
        "device_busy_pct_of_wall": round(total / 1e6 / wall * 100, 1),
        "by_class": {k: {"total_ms": round(v[0] / 1e3, 2),
                         "pct": round(100 * v[0] / total, 1),
                         "calls": v[1]}
                     for k, v in sorted(by_class.items(),
                                        key=lambda kv: -kv[1][0])},
        "top_ops": rows[:30],
    }


def profile_program(tag: str, run_epoch, epochs: int) -> dict:
    trace_dir = f"/tmp/sdumc_profile_{tag}"
    os.system(f"rm -rf {trace_dir}")
    run_epoch()  # compile + warm
    t0 = time.perf_counter()
    jax.profiler.start_trace(trace_dir)
    try:
        for _ in range(epochs):
            run_epoch()
    finally:
        jax.profiler.stop_trace()
    return op_table(tag, trace_dir, time.perf_counter() - t0, epochs)


def write_artifacts(results: dict, stem: str, header: str):
    os.makedirs(os.path.join(REPO, "profiles"), exist_ok=True)
    with open(os.path.join(REPO, "profiles", f"{stem}.json"), "w") as f:
        json.dump(results, f, indent=1)
    lines = [f"# {header}", "",
             f"Device: {results['device']}  (generated by "
             "scripts/profile_train.py)", ""]
    for tag, r in results.items():
        if not isinstance(r, dict) or "by_class" not in r:
            continue
        lines += [f"## {tag}",
                  "",
                  f"device busy {r['device_total_ms']} ms over "
                  f"{r['wall_s']} s wall ({r['device_busy_pct_of_wall']}% "
                  "— the gap is dispatch/tunnel latency)", "",
                  "| class | total ms | % device | calls |",
                  "|---|---|---|---|"]
        for k, v in r["by_class"].items():
            lines.append(
                f"| {k} | {v['total_ms']} | {v['pct']} | {v['calls']} |")
        lines += ["", "| op | total us | % | calls | class |",
                  "|---|---|---|---|---|"]
        for row in r["top_ops"][:15]:
            lines.append(f"| {row['op']} | {row['total_us']} | "
                         f"{row['pct_device']} | {row['calls']} | "
                         f"{row['class']} |")
        lines.append("")
    with open(os.path.join(REPO, "profiles", f"{stem}.md"), "w") as f:
        f.write("\n".join(lines))
    print(f"wrote profiles/{stem}.{{json,md}}")


def profile_decode(argv_rest=None):
    """Per-op profile of the 7B-shaped w8a8 feat4 beam decode at
    gen_batch=8 (the production extractor program): where each decode
    step's device time goes — weight-streaming dots, cache-reading
    attention fusions, or the beam-ancestry cache gather (copy class)."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import bench_extractors

    trace_dir = "/tmp/sdumc_profile_decode"
    os.system(f"rm -rf {trace_dir}")
    t0 = time.perf_counter()
    stats = bench_extractors.bench_feat4(
        batches=(8,), quant="w8a8", reps=1, profile_dir=trace_dir)
    wall = time.perf_counter() - t0
    results = {
        "device": str(jax.devices()[0]),
        "bench_stats": stats,
        "decode_w8a8_b8": op_table("decode_w8a8_b8", trace_dir, wall, 1),
    }
    write_artifacts(results, "decode_ops",
                    "Per-op TPU profile: feat4 w8a8 beam-4 decode, "
                    "gen_batch=8")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--decode", action="store_true",
                   help="profile the feat4 decode program instead of "
                        "train/eval (writes profiles/decode_ops.*)")
    args = p.parse_args(argv)
    if args.decode:
        profile_decode()
        return

    import jax.numpy as jnp

    import bench
    from sdumc_tpu.cli.common import build_model_and_params
    from sdumc_tpu.core.config import ExperimentConfig
    from sdumc_tpu.train.state import create_train_state
    from sdumc_tpu.train.step import batch_to_device_dict, make_eval_step, \
        make_train_step

    print("device:", jax.devices()[0])
    device_batches = bench.stage_device_batches("bfloat16")

    cfg = ExperimentConfig()
    model, params = build_model_and_params(cfg, bench.DIMS)
    state = create_train_state(model, jax.device_put(params),
                               lambda s: 1e-4, l2=1e-5)
    step = make_train_step(model, cfg.loss)
    eval_step = make_eval_step(model)
    rng = jax.random.key(0, impl="rbg")  # production rng (TrainConfig.rng_impl)

    state_box = [state]

    def train_epoch():
        acc = None
        s = state_box[0]
        for d in device_batches:
            s, metrics = step(s, d, rng)
            acc = metrics if acc is None else acc
        state_box[0] = s
        float(jax.device_get(acc["loss"]))

    def eval_epoch():
        import numpy as np

        outs = [eval_step(state_box[0].params, d) for d in device_batches]
        np.asarray(outs[-1][0])

    results = {
        "device": str(jax.devices()[0]),
        "config": f"bf16 features, {bench.BATCH_SIZE}-clip batches x "
                  f"{bench.N_BATCHES}, {args.epochs} epochs traced",
        "train": profile_program("train", train_epoch, args.epochs),
        "eval": profile_program("eval", eval_epoch, args.epochs),
    }
    write_artifacts(results, "step_ops",
                    "Per-op TPU profile: train + eval steps")
    print(json.dumps({t: {"device_total_ms": results[t]["device_total_ms"],
                          "by_class": results[t]["by_class"]}
                      for t in ("train", "eval")}, indent=1))


if __name__ == "__main__":
    main()
