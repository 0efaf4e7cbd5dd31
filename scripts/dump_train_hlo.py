#!/usr/bin/env python
"""Dump the optimized train-step HLO and rank fusions by HBM bytes touched.

VERDICT r4 item 2: the per-op trace (profiles/step_ops.md) shows WHERE time
goes (76% elementwise fusions) but not WHAT those fusions touch. This
compiles the production train step (bf16 features, B=128 MOSEI buckets) for
the real TPU target, then walks the optimized HLO: for every fusion it sums
operand + output buffer sizes (an upper bound that ignores reuse *within*
the fusion — exactly the traffic a fusion pays against HBM when its inputs
don't fit VMEM) and prints the top entries with their root expressions, so
the big fusions in the trace can be matched to model code.

    python scripts/dump_train_hlo.py [--out profiles/train_hlo_top.md]
"""

from __future__ import annotations

import argparse
import os
import re
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/sdumc_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402  (reuses the bench batch/staging machinery)

DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "s8": 1,
               "u8": 1, "pred": 1, "s64": 8, "u64": 8, "f64": 8, "u16": 2,
               "s16": 2}


def shape_bytes(shape_str: str) -> int:
    """'bf16[256,512,256]{2,1,0:T(8,128)(2,1)}' -> byte count (layout and
    tiling annotations ignored; tuples summed)."""
    total = 0
    for m in re.finditer(r"(\w+)\[([\d,]*)\]", shape_str):
        dt, dims = m.group(1), m.group(2)
        if dt not in DTYPE_BYTES:
            continue
        n = 1
        if dims:
            for d in dims.split(","):
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "profiles",
                                                  "train_hlo_top.md"))
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    from sdumc_tpu.cli.common import build_model_and_params
    from sdumc_tpu.core.config import ExperimentConfig
    from sdumc_tpu.train.state import create_train_state
    from sdumc_tpu.train.step import make_train_step

    cfg = ExperimentConfig()
    model, params = build_model_and_params(cfg, bench.DIMS)
    state = create_train_state(model, params, lambda s: 1e-4, l2=1e-5)
    step = make_train_step(model, cfg.loss)
    rng = jax.random.key(0, impl="rbg")

    batches = bench.stage_device_batches("bfloat16")
    compiled = jax.jit(step, donate_argnums=(0,)).lower(
        state, batches[0], rng).compile()
    txt = compiled.as_text()

    # per-instruction parse of the ENTRY computation: lines look like
    # "  %name = bf16[256,512,256]{2,1,0:T(8,128)(2,1)} fusion(%a, %b), ..."
    lines = txt.splitlines()
    start = next(i for i, l in enumerate(lines) if l.startswith("ENTRY "))
    fusions = []  # (total_bytes, out_bytes, in_bytes, name, line)
    for ln in lines[start + 1:]:
        if ln.startswith("}"):
            break
        m = re.match(r"\s*(?:ROOT )?(%[\w.\-]+) = (\S+) (\w[\w\-]*)\((.*)",
                     ln)
        if not m:
            continue
        name, shape, op, rest = m.groups()
        if op in ("parameter", "constant", "get-tuple-element", "tuple",
                  "bitcast"):
            continue
        out_b = shape_bytes(shape)
        in_b = shape_bytes(rest)  # operand shapes don't appear inline for
        # named operands; this counts only literal shapes (usually none),
        # so the ranking is by OUTPUT bytes with operand bytes as a bonus
        fusions.append((out_b + in_b, out_b, in_b, name, ln.strip()[:400]))

    fusions.sort(reverse=True)
    total = sum(f[0] for f in fusions)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        f.write("# Train-step optimized HLO: top instructions by bytes\n\n")
        f.write(f"program: dual-view train step, bf16 features, B=128 "
                f"buckets {bench.BUCKETS}\n")
        f.write(f"instructions counted: {len(fusions)}; "
                f"sum operand+output bytes: {total/1e9:.2f} GB "
                f"(upper bound; ignores operand sharing between "
                f"instructions)\n\n")
        f.write("| MB (in+out) | out MB | instruction |\n|---|---|---|\n")
        for tot_b, out_b, in_b, name, ln in fusions[:args.top]:
            f.write(f"| {tot_b/1e6:.1f} | {out_b/1e6:.1f} | `{ln[:300]}` |\n")
    # full HLO for manual digging
    hlo_path = os.path.join(REPO, "profiles", "train_step.hlo.txt")
    with open(hlo_path, "w") as f:
        f.write(txt)
    print(f"wrote {args.out} and {hlo_path} "
          f"({len(txt.splitlines())} HLO lines)")
    for tot_b, out_b, in_b, name, ln in fusions[:12]:
        print(f"{tot_b/1e6:9.1f} MB  {ln[:160]}")


if __name__ == "__main__":
    main()
