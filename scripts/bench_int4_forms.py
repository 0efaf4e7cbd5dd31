#!/usr/bin/env python
"""Microbench: int4 dequant-dot formulations vs int8, at decode shapes.

The grouped-einsum int4 form (ops/quant.py r2) splinters the matmul into
k=in/128 tiny [R,128]x[128,out] dots — MXU-hostile at decode row counts.
Candidate fix: ONE dot contracting (group, pos, nibble) jointly with the
group scale pre-multiplied onto the unpacked weight operand, so XLA fuses
bitcast->convert->scale into the operand read exactly like the int8
path's convert. This script times both against int8 and prints XLA's
bytes-accessed so operand-fusion vs materialization is visible.

    python scripts/bench_int4_forms.py [rows=1,4,32]
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

from sdumc_tpu.utils.roofline import program_cost  # noqa: E402

IN, OUT, G = 4096, 11008, 128
K = IN // G
ROWS = (1, 4, 32)
for a in sys.argv[1:]:
    if a.startswith("rows="):
        ROWS = tuple(int(x) for x in a[5:].split(","))

rng = np.random.default_rng(0)
wq8 = jnp.asarray(rng.integers(-127, 128, size=(IN, OUT), dtype=np.int8))
s8 = jnp.asarray(rng.uniform(0.001, 0.01, size=(OUT,)).astype(np.float32))
wq4 = jnp.asarray(rng.integers(-128, 128, size=(IN // 2, OUT), dtype=np.int8))
s4 = jnp.asarray(rng.uniform(0.001, 0.01, size=(K, OUT)).astype(np.float32))


def int8_dot(x, wq, s):
    y = jax.lax.dot_general(x, wq.astype(jnp.bfloat16),
                            (((x.ndim - 1,), (0,)), ((), ())))
    return y * s.astype(jnp.bfloat16)


def int4_grouped(x, wq, s):
    w4 = jax.lax.bitcast_convert_type(wq, jnp.int4)
    xr = x.reshape(*x.shape[:-1], K, G // 2, 2)
    wr = w4.reshape(K, G // 2, OUT, 2).astype(jnp.bfloat16)
    partial = jnp.einsum("rkpj,kpoj->rko", xr, wr,
                         preferred_element_type=jnp.float32)
    return jnp.einsum("rko,ko->ro", partial, s).astype(jnp.bfloat16)


def int4_fused(x, wq, s):
    w4 = jax.lax.bitcast_convert_type(wq, jnp.int4)
    xr = x.reshape(*x.shape[:-1], K, G // 2, 2)
    wr = w4.reshape(K, G // 2, OUT, 2).astype(jnp.bfloat16)
    wr = wr * s[:, None, :, None].astype(jnp.bfloat16)
    return jnp.einsum("rkpj,kpoj->ro", xr, wr,
                      preferred_element_type=jnp.float32).astype(jnp.bfloat16)


def bench(fn, *args, iters=200):
    # scan the op inside ONE program: a single dispatch times `iters`
    # device iterations, so the dev-tunnel's per-call jitter (~100us)
    # cannot swamp a ~30us op. The x-input is perturbed per step so XLA
    # cannot hoist the dot out of the loop; weights stream from HBM every
    # iteration, as decode does.
    x, w, s = args

    def body(carry, i):
        y = fn(x + carry, w, s)
        return y[0, :1].astype(jnp.float32) * 1e-9, None

    @jax.jit
    def run(x0):
        out, _ = jax.lax.scan(body, x0, jnp.arange(iters))
        return out

    z = jnp.zeros((1,), jnp.float32)
    run(z).block_until_ready()
    flops, nbytes = program_cost(jax.jit(fn).lower(*args).compile())
    t0 = time.perf_counter()
    run(z).block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    return dt, nbytes


for R in ROWS:
    x = jnp.asarray(rng.normal(size=(R, IN)).astype(np.float32)).astype(jnp.bfloat16)
    row = {"rows": R}
    for name, fn, w, s in (("int8", int8_dot, wq8, s8),
                           ("int4_grouped", int4_grouped, wq4, s4),
                           ("int4_fused", int4_fused, wq4, s4)):
        dt, nbytes = bench(fn, x, w, s)
        row[name] = f"{dt*1e6:.0f}us bytes={nbytes/1e6:.1f}MB"
    print(row)
