#!/usr/bin/env python
"""TPU microbench: Pallas int4 kernel vs int8 dense at 7B decode shapes.

Times a scanned loop of N matmuls inside ONE program (dispatch jitter over
the tunnel swamps single-call timings at these sizes) and prints effective
HBM GB/s assuming the weight stream dominates. The kernel wins iff its
per-call time beats int8's — decode is weight-stream-bound, so the 2x
byte reduction should show directly if the unpack stays in VMEM.

    python scripts/bench_int4_kernel.py [rows=1,4,8]
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/sdumc_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from sdumc_tpu.ops.pallas.int4_matmul import int4_matmul  # noqa: E402

IN, OUT, G = 4096, 11008, 128
K = IN // G
ROWS = (1, 4, 8)
REPS = 20
for a in sys.argv[1:]:
    if a.startswith("rows="):
        ROWS = tuple(int(x) for x in a[5:].split(","))

rng = np.random.default_rng(0)
wq8 = jnp.asarray(rng.integers(-127, 128, size=(IN, OUT), dtype=np.int8))
s8 = jnp.asarray(rng.uniform(0.001, 0.01, size=(OUT,)).astype(np.float32))
wq4 = jnp.asarray(rng.integers(-128, 128, size=(IN // 2, OUT), dtype=np.int8))
s4 = jnp.asarray(rng.uniform(0.001, 0.01, size=(K, OUT)).astype(np.float32))


def int8_dot(x):
    y = jax.lax.dot_general(x, wq8.astype(jnp.bfloat16),
                            (((x.ndim - 1,), (0,)), ((), ())))
    return y * s8.astype(jnp.bfloat16)


def pallas_int4(x):
    return int4_matmul(x, wq4, s4)


def timed(fn, rows):
    # scan over REPS DISTINCT inputs: iterations are independent (no carry
    # feedback), so weight-stream DMAs pipeline across steps like they do
    # in a real decode trunk, but the per-step x differs so XLA cannot
    # hoist the matmul out of the loop.
    xs = jnp.asarray(rng.normal(size=(REPS, rows, IN)).astype(np.float32),
                     dtype=jnp.bfloat16)

    @jax.jit
    def loop(xs):
        def body(carry, x):
            y = fn(x)
            return carry, y[0, 0]
        return jax.lax.scan(body, 0.0, xs)[1]

    r = loop(xs)
    r.block_until_ready()
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        loop(xs).block_until_ready()
        best = min(best, (time.perf_counter() - t0) / REPS)
    return best


for rows in ROWS:
    t8 = timed(int8_dot, rows)
    print(f"rows={rows}: int8 {t8*1e6:.1f} us", flush=True)
    t4 = timed(pallas_int4, rows)
    b8 = IN * OUT  # int8 bytes
    b4 = IN * OUT // 2 + K * OUT * 4
    print(f"rows={rows:3d}  int8 {t8*1e6:8.1f} us ({b8/t8/1e9:6.1f} GB/s)  "
          f"pallas-int4 {t4*1e6:8.1f} us ({b4/t4/1e9:6.1f} GB/s)  "
          f"speedup x{t8/t4:.2f}")
