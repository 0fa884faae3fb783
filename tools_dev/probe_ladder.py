#!/usr/bin/env python
"""On-chip microbench of Rice-search popcount-ladder variants.

The stage profiler attributes +16.4 ms/batch to the bit-plane
popcount ladder (and +10.2 ms to lpc_residuals).  This probe times
isolated variants on the real device to pick the lowest-traffic
formulation before touching the production program.

Usage: python tools_dev/probe_ladder.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

S, C, PARTS, PSIZE = 2048, 13, 64, 64
J0 = 14

rng = np.random.default_rng(3)
u_np = rng.geometric(0.001, (S, C, PARTS, PSIZE)).astype(np.int32)
u_np = np.minimum(u_np, (1 << 23) - 1)

dev = jax.devices()[0]
u = jax.device_put(u_np, dev)
jax.block_until_ready(u)


def bench(fn, *args, iters=8):
    jax.device_get(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.device_get(fn(*args))
        times.append(time.perf_counter() - t0)
    return min(times)


def reduce_all(*arrs):
    tot = jnp.float32(0)
    for a in arrs:
        tot = tot + jnp.sum(a.astype(jnp.float32))
    return tot


@jax.jit
def trivial(u):
    return jnp.sum(u[:, :, ::16, 0].astype(jnp.float32))


@jax.jit
def v0_current(u):
    """current production formulation: uint8 byte splits, plane sums"""
    w_cols = []
    for b in range((J0 + 7) // 8):
        cb = ((u >> (8 * b)) & 0xFF).astype(jnp.uint8)
        for j in range(8 * b, min(8 * b + 8, J0)):
            w_cols.append(jnp.sum((cb >> (j - 8 * b)) & jnp.uint8(1),
                                  axis=-1, dtype=jnp.int32))
    t_top = jnp.sum(u >> J0, axis=-1, dtype=jnp.int32)
    w = jnp.stack(w_cols + [t_top], axis=-1)
    return reduce_all(w)


@jax.jit
def v1_barrier(u):
    """byte splits forced to materialize (plane sums read uint8)"""
    w_cols = []
    for b in range((J0 + 7) // 8):
        cb = ((u >> (8 * b)) & 0xFF).astype(jnp.uint8)
        cb = jax.lax.optimization_barrier(cb)
        for j in range(8 * b, min(8 * b + 8, J0)):
            w_cols.append(jnp.sum((cb >> (j - 8 * b)) & jnp.uint8(1),
                                  axis=-1, dtype=jnp.int32))
    t_top = jnp.sum(u >> J0, axis=-1, dtype=jnp.int32)
    w = jnp.stack(w_cols + [t_top], axis=-1)
    return reduce_all(w)


@jax.jit
def v2_planes_u8(u):
    """one broadcasted bit expansion [.., PSIZE, J0] u8 then sum"""
    planes = ((u[..., None] >> jnp.arange(J0, dtype=jnp.int32)) &
              1).astype(jnp.uint8)
    w = jnp.sum(planes, axis=-2, dtype=jnp.int32)
    t_top = jnp.sum(u >> J0, axis=-1, dtype=jnp.int32)
    return reduce_all(w, t_top)


@jax.jit
def v3_descent_direct(u):
    """direct msb sums via int32 shifts (no byte split): 15 reduces"""
    outs = [jnp.sum(u >> r, axis=-1, dtype=jnp.int32)
            for r in range(J0 + 1)]
    return reduce_all(jnp.stack(outs, axis=-1))


@jax.jit
def v4_barrier_u16(u):
    """u pre-narrowed: lo uint16 (planes 0..13) + hi for t_top"""
    lo = (u & 0x3FFF).astype(jnp.uint16)
    lo = jax.lax.optimization_barrier(lo)
    hi = (u >> J0).astype(jnp.int32)
    w_cols = [jnp.sum((lo >> j) & jnp.uint16(1), axis=-1,
                      dtype=jnp.int32) for j in range(J0)]
    t_top = jnp.sum(hi, axis=-1, dtype=jnp.int32)
    w = jnp.stack(w_cols + [t_top], axis=-1)
    return reduce_all(w)


for name, fn in [("trivial (rtt floor)", trivial),
                 ("v0 current byte-split", v0_current),
                 ("v1 + barrier", v1_barrier),
                 ("v2 plane expand u8", v2_planes_u8),
                 ("v3 direct i32 msb sums", v3_descent_direct),
                 ("v4 barrier u16", v4_barrier_u16)]:
    t0 = time.perf_counter()
    dt = bench(fn, u)
    print("%-26s %8.2f ms   [warmup %.0fs]" %
          (name, dt * 1e3, time.perf_counter() - t0), flush=True)
