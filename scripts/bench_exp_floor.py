#!/usr/bin/env python
"""Measure the VPU exp/elementwise floor and test flash-kernel levers.

VERDICT r4 item 3: the long-clip flash kernel sits at 21.7% MFU / 38.7%
HBM — no hardware bound — and the round-4 sweep blamed "VPU exp
throughput over [blk, blk] scores" without measuring what that floor IS.
This script:

  1. measures the chip's elementwise rates (elems/s) INSIDE one jitted
     fori_loop program — one-pass-per-iteration for the HBM-streaming
     rate, the op composed 8x per iteration for the in-register VPU rate
     (dispatch-per-op measures the tunnel: ~12 Gelem/s for a multiply);
  2. computes the kernel's VPU-floor model: the long8 regime pushes
     B*H*Tp^2 score elements per layer x 24 layers through ~3 plain
     element-ops + 1 exp each, all VMEM-resident;
  3. times the actual long8 flash encoder call and reports measured wall
     vs the floor model — near 1 means the kernel is at the VPU
     softmax wall and further schedule tuning cannot pay;
  4. re-times the kernel at the untried levers the verdict named
     (wider query tiles via block=1024, deeper head packing, exp_base2)
     under hard-sync barriers.

Writes profiles/flash_tune_r5.md.  Run on the TPU (one client at a time).
"""

from __future__ import annotations

import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/sdumc_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def sync(x):
    """Hard barrier: 4-byte fetch of a device-side reduction (axon's
    block_until_ready reports ready at enqueue — round-4 lesson)."""
    return float(jax.jit(jnp.sum)(x.ravel()[:8].astype(jnp.float32)))


def time_fn(fn, *args, reps=8):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / reps


def elementwise_rates():
    """Per-element rates measured INSIDE one jitted program (a fori_loop
    carries the array between iterations), because a dispatch RPC over the
    dev tunnel costs ~5-35 ms — dispatch-per-op measured ~12 Gelem/s for a
    plain multiply, which is the tunnel, not the chip.

    Two regimes per op:
      *_stream: one pass per loop iteration, array re-read/re-written from
        HBM each time (loop-carried dependence defeats cross-iteration
        fusion) -> the HBM-streaming rate;
      *_reg: the op COMPOSED 8x inside each iteration — 8 applications per
        HBM round-trip, so the number approaches the in-register VPU rate
        (what the flash kernel's VMEM-resident softmax actually pays)."""
    N = 1 << 24  # 16M elements
    K = 32
    res = {}
    for dt, tag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        x = jnp.asarray(
            np.random.default_rng(0).uniform(-1, 0, size=(N,)), dtype=dt)

        def loop(op, reps_inner):
            def body(i, a):
                for _ in range(reps_inner):
                    a = op(a)
                return a

            return jax.jit(lambda a: jax.lax.fori_loop(0, K, body, a))

        mul = lambda a: a * jnp.asarray(0.9999, a.dtype)  # noqa: E731
        ex = lambda a: jnp.exp(  # keep the domain in [-1, 0]: exp stays
            a * jnp.asarray(0.5, a.dtype)) - jnp.asarray(1.0, a.dtype)  # noqa: E731

        res[f"mul_stream_{tag}"] = K * N / time_fn(loop(mul, 1), x, reps=2)
        res[f"exp_stream_{tag}"] = K * N / time_fn(loop(ex, 1), x, reps=2)
        res[f"mul_reg_{tag}"] = 8 * K * N / time_fn(loop(mul, 8), x, reps=2)
        res[f"exp_reg_{tag}"] = 8 * K * N / time_fn(loop(ex, 8), x, reps=2)
    return res


def _wavlm_setup(**kw):
    from sdumc_tpu.models.wavlm import WavLMConfig, WavLMModel

    rng = np.random.default_rng(0)
    cfg = WavLMConfig(attention_impl="flash", dtype=jnp.bfloat16, **kw)
    model = WavLMModel(cfg)
    S = 60 * 16000
    T = cfg.output_length(S)
    wav = jnp.asarray(rng.normal(size=(8, S)).astype(np.float32))
    mask = jnp.ones((8, T), bool)
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), wav[:1],
                           pad_mask=mask[:1]))["params"]
    leaves, treedef = jax.tree_util.tree_flatten(shapes)

    @jax.jit
    def make_params(key):
        ks = jax.random.split(key, len(leaves))
        return jax.tree_util.tree_unflatten(
            treedef, [0.02 * jax.random.normal(k, l.shape, jnp.bfloat16)
                      for k, l in zip(ks, leaves)])

    params = make_params(jax.random.PRNGKey(1))

    @jax.jit
    def run(p, w, m):
        hs = model.apply({"params": p}, w.astype(jnp.bfloat16), pad_mask=m,
                         output_hidden_states=True)["hidden_states"]
        return hs[-5].astype(jnp.float32).mean()

    return cfg, run, (params, wav, mask), T


def main():
    out_lines = ["# Flash long-clip kernel: measured VPU floor (round 5)",
                 "", f"Device: {jax.devices()[0]}", ""]

    rates = elementwise_rates()
    out_lines.append("## Elementwise rates (16M-element arrays, 32-iteration "
                     "in-program fori_loops, hard-sync barriers)")
    out_lines.append("")
    out_lines.append("| op | Gelem/s |")
    out_lines.append("|---|---|")
    for k, v in rates.items():
        out_lines.append(f"| {k} | {v / 1e9:.1f} |")
    out_lines.append("")

    # floor model for long8: per score element the kernel's VMEM-resident
    # softmax pays ~3 non-transcendental VPU element-ops (bias multiply-
    # add, running-max compare, subtract+bf16-cast riding the exp pass)
    # plus one exp. MXU dot time and the [blk, hd] accumulator rescales
    # are an order of magnitude smaller and are left out (the model is a
    # floor).
    from sdumc_tpu.models.wavlm import WavLMConfig

    cfg0 = WavLMConfig()
    B, H, L = 8, cfg0.num_heads, cfg0.num_layers
    T = cfg0.output_length(60 * 16000)
    blk = cfg0.resolved_flash_block()
    n = -(-T // blk)
    Tp = n * blk
    elems = B * H * Tp * Tp * L
    floor_exp = elems * (3.0 / rates["mul_reg_f32"]
                         + 1.0 / rates["exp_reg_f32"])
    out_lines.append(
        f"## VPU-floor model: long8 (B={B}, H={H}, T={T}->Tp={Tp}, "
        f"block={blk}, {L} layers)")
    out_lines.append("")
    out_lines.append(
        f"- score elements through softmax: {elems / 1e9:.1f} G")
    out_lines.append(
        f"- floor = elems x (3 plain ops + 1 exp) at the in-register "
        f"rates: **{floor_exp * 1e3:.0f} ms**")

    # measured kernel at the default config and at the verdict's levers
    variants = [
        ("default (block=512, hb=8)", {}),
        ("block=1024 (wider tiles)", {"flash_block": 1024}),
        ("head_block=16 (all heads)", {"flash_head_block": 16}),
        ("exp_base2", {"flash_exp_base2": True}),
    ]
    out_lines.append("")
    out_lines.append("## Measured long8 encoder (8 x 60 s clips, bf16)")
    out_lines.append("")
    out_lines.append("| variant | ms/call | clips/s | vs exp floor |")
    out_lines.append("|---|---|---|---|")
    best = None
    for name, kw in variants:
        try:
            cfg, run, args, _ = _wavlm_setup(**kw)
            dt = time_fn(run, *args, reps=6)
            row = (f"| {name} | {dt * 1e3:.0f} | {8 / dt:.2f} | "
                   f"{dt / floor_exp:.2f}x |")
            if best is None or dt < best[1]:
                best = (name, dt)
        except Exception as e:
            row = f"| {name} | error: {str(e).splitlines()[0][:90]} | | |"
        out_lines.append(row)
        print(row, flush=True)

    if best:
        ratio = best[1] / floor_exp
        out_lines.append("")
        out_lines.append(
            f"## Conclusion: best = {best[0]} at {best[1] * 1e3:.0f} ms = "
            f"{ratio:.2f}x the measured exp floor")
        if ratio < 1.45:
            out_lines.append(
                "The kernel is at (or within scheduling distance of) the "
                "VPU transcendental wall: the remaining gap is the "
                "bias-add/max/cast passes that share the exp's VMEM "
                "stream. Neither MFU nor HBM% can rise further without "
                "REMOVING exp work (e.g. lower-precision softmax with "
                "different numerics) — this is the Mosaic-limit "
                "conclusion the round-4 verdict asked for: full "
                "bidirectional attention at T=3000 pays O(T^2) "
                "transcendentals and the VPU, not the MXU or HBM, is the "
                "governing unit.")
        else:
            out_lines.append(
                "A >1.45x gap to the exp floor means schedule overhead "
                "still dominates — keep tuning (pipelining, tile shapes).")

    path = os.path.join(REPO, "profiles", "flash_tune_r5.md")
    with open(path, "w") as f:
        f.write("\n".join(out_lines) + "\n")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
