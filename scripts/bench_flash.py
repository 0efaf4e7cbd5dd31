#!/usr/bin/env python
"""TPU microbench + parity: factored-bias flash attention vs einsum path.

SCOPE CAVEAT: this measures the attention op in ISOLATION with
``jax_default_matmul_precision=highest`` (so the parity check compares
f32-exact numerics) — that also pins the einsum baseline to the slow
highest-precision MXU passes, so these ratios are NOT production. Use
this script for kernel parity and kernel-only iteration; use
bench_extractors.py (full model, default precision) for production
numbers — with the head-packed kernel those show flash ahead at every
long regime (T=2999 B=1 bf16 15.4 vs 10.4 clips/s, f32 11.7 vs 7.3,
B=8 bf16 19.6 vs 18.5) and einsum ahead in the bulk T~500 regime. The
auto policy's crossover knobs live in WavLMConfig (flash_min_frames /
flash_score_budget; scripts/bench_flash_crossover.py re-places them)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

# the kernel computes in f32 on the MXU; hold the einsum path to the same
# precision or the parity check measures XLA's default bf16 passes instead
jax.config.update("jax_default_matmul_precision", "highest")
import jax.numpy as jnp

from sdumc_tpu.ops.pallas.flash_wavlm import bucket_from_rel, flash_gated_attention

NB, MD = 320, 800  # wavlm-large
H, HD = 16, 64


def einsum_path(q, k, v, gate, rel_embed, kvalid):
    B, T = q.shape[:2]
    rel = jnp.arange(T)[None, :] - jnp.arange(T)[:, None]
    buckets = bucket_from_rel(rel, NB, MD)
    pb = jnp.transpose(jnp.take(rel_embed, buckets, axis=0), (2, 0, 1))
    scores = jnp.einsum("bthd,bshd->bhts", q, k) / jnp.sqrt(q.shape[-1])
    scores = scores + gate[..., None] * pb[None]
    scores = jnp.where(kvalid[:, None, None, :] > 0, scores, -1e30)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    return jnp.einsum("bhts,bshd->bthd", probs.astype(q.dtype), v)


def bench(fn, *args, iters=10):
    # hard sync = 4-byte fetch of a device-side reduction: over the axon
    # tunnel block_until_ready reports ready at enqueue (the bug that made
    # an earlier sweep read thousands of TF/s — see bench_flash_tune.py)
    sync = jax.jit(jnp.sum)
    out = fn(*args)
    float(sync(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(sync(out))
    return (time.perf_counter() - t0) / iters


def main():
    print("device:", jax.devices()[0])
    rng = np.random.default_rng(0)
    rel_embed = jnp.asarray(rng.normal(size=(NB, H)).astype(np.float32))

    flash = jax.jit(lambda q, k, v, g, kv: flash_gated_attention(
        q, k, v, g, rel_embed, kv, num_buckets=NB, max_distance=MD,
        precision=jax.lax.Precision.HIGHEST))
    einsum = jax.jit(lambda q, k, v, g, kv: einsum_path(
        q, k, v, g, rel_embed, kv))

    for B, T in [(8, 512), (4, 1024), (1, 3072), (1, 6144)]:
        q, k, v = (jnp.asarray(rng.normal(size=(B, T, H, HD)).astype(np.float32))
                   for _ in range(3))
        gate = jnp.asarray((1 + rng.uniform(size=(B, H, T))).astype(np.float32))
        kvalid = jnp.ones((B, T), jnp.float32)

        tf = bench(flash, q, k, v, gate, kvalid)
        if T <= 3072:
            te = bench(einsum, q, k, v, gate, kvalid)
            if T == 512:
                a = np.asarray(flash(q, k, v, gate, kvalid))
                b = np.asarray(einsum(q, k, v, gate, kvalid))
                err = np.max(np.abs(a - b))
                print(f"parity max|diff| @T=512: {err:.2e}")
                assert err < 2e-4, err
        else:
            te = float("nan")  # einsum would need ~4.8 GB of score tensors
        flops = 4 * B * H * T * T * HD  # qk + pv
        print(f"B={B} T={T}: flash {tf*1e3:7.2f} ms ({flops/tf/1e12:5.2f} TF/s)"
              f"  einsum {te*1e3:7.2f} ms  speedup {te/tf:5.2f}x")


if __name__ == "__main__":
    main()
