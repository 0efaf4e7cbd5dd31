#!/usr/bin/env python
"""Kernel-only sweep of the flash-WavLM tuning knobs at long-clip shapes.

Sweeps (block, head_block, exp_base2) at PRODUCTION precision (DEFAULT)
on the T~3000 wavlm-large shape that dominates long-clip extraction
(bench_extractors long8_*: 18.9% MFU / 32.4% HBM — neither bound, so the
kernel grid itself is suspect). Prints ms + achieved TF/s per config;
promote the winner into the model's flash call-site defaults.

    python scripts/bench_flash_tune.py [T=2999] [B=8]
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

from sdumc_tpu.ops.pallas.flash_wavlm import flash_gated_attention  # noqa: E402

NB, MD = 320, 800
H, HD = 16, 64
T, B = 2999, 8
for a in sys.argv[1:]:
    if a.startswith("T="):
        T = int(a[2:])
    elif a.startswith("B="):
        B = int(a[2:])

rng = np.random.default_rng(0)
dt = jnp.bfloat16
q = jnp.asarray(rng.normal(size=(B, T, H, HD)), dt) * 0.1
k = jnp.asarray(rng.normal(size=(B, T, H, HD)), dt) * 0.1
v = jnp.asarray(rng.normal(size=(B, T, H, HD)), dt) * 0.1
gate = jnp.asarray(rng.uniform(0.5, 1.5, size=(B, H, T)), jnp.float32)
rel = jnp.asarray(rng.normal(size=(NB, H)), jnp.float32) * 0.1
kvalid = jnp.ones((B, T), jnp.int32)

flops = 4 * B * H * T * T * HD  # QK^T + PV

print("device:", jax.devices()[0], f" T={T} B={B} bf16")
best = None
for block in (256, 512, 1024):
    for hb in (1, 2, 4, 8, None):
        for e2 in (False, True):
            fn = jax.jit(lambda q, k, v, g, r, kv, _b=block, _h=hb, _e=e2:
                         flash_gated_attention(
                             q, k, v, g, r, kv, num_buckets=NB,
                             max_distance=MD, block=_b, head_block=_h,
                             exp_base2=_e))
            # block_until_ready is NOT a hard barrier over the axon
            # tunnel (buffers report ready at enqueue); a 4-byte fetch of
            # a device-side reduction is — programs run in stream order,
            # so fetching sum(out) waits for every dispatched call.
            sync = jax.jit(jnp.sum)
            try:
                out = fn(q, k, v, gate, rel, kvalid)
                float(sync(out))
            except Exception as exc:  # VMEM overflow at big blocks etc.
                print(f"block={block} hb={hb} e2={int(e2)}: FAIL "
                      f"{type(exc).__name__}: {str(exc)[:90]}")
                continue
            t0 = time.perf_counter()
            for _ in range(5):
                out = fn(q, k, v, gate, rel, kvalid)
            float(sync(out))
            dt_s = (time.perf_counter() - t0) / 5
            tfs = flops / dt_s / 1e12
            tag = f"block={block} hb={'all' if hb is None else hb} e2={int(e2)}"
            print(f"{tag:28s} {dt_s*1e3:7.2f} ms  {tfs:6.2f} TF/s")
            if best is None or dt_s < best[0]:
                best = (dt_s, tag)
print("BEST:", best[1], f"{best[0]*1e3:.2f} ms")
