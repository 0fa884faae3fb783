#!/usr/bin/env python
"""Probes lax.scan per-step cost on the attached device.

Times: (a) a trivial scan (carry [P] int32, +1 body), (b) a scan with
an [P]-row take_along_axis gather per step, (c) a scan with an [S,32]
f64 dot per step, (d) same dot in f32, at two lengths — separating
fixed step overhead from body cost.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

P = 512
N = 65536
L = 4096

table = jnp.asarray(np.random.default_rng(0).integers(
    0, N, (P, N)).astype(np.int32))
qf = jnp.asarray(np.random.default_rng(1).normal(
    size=(P, 32)))


def bench(label, fn, *args, iters=4):
    jax.device_get(fn(*args))
    best = None
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.device_get(fn(*args))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print("%-30s %8.1f ms  (%5.1f us/step)"
          % (label, best * 1e3, best * 1e6 / L), flush=True)


@jax.jit
def trivial(x):
    def body(c, _):
        return (c + 1, c[0])
    (c, ys) = jax.lax.scan(body, x, None, length=L)
    return ys


@jax.jit
def with_gather(x):
    def body(c, _):
        g = jnp.take_along_axis(table, (c % N)[:, None],
                                axis=1)[:, 0]
        return (c + g % 7 + 1, c[0])
    (c, ys) = jax.lax.scan(body, x, None, length=L)
    return ys


@jax.jit
def with_dot64(x):
    def body(c, _):
        s = jnp.sum(qf * c[:, None], axis=1)
        return (c + s.astype(jnp.int32) % 3, c[0])
    (c, ys) = jax.lax.scan(body, x, None, length=L)
    return ys


@jax.jit
def with_dot32(x):
    qf32 = qf.astype(jnp.float32)

    def body(c, _):
        s = jnp.sum(qf32 * c.astype(jnp.float32)[:, None], axis=1)
        return (c + s.astype(jnp.int32) % 3, c[0])
    (c, ys) = jax.lax.scan(body, x, None, length=L)
    return ys


x0 = jnp.zeros(P, dtype=jnp.int32)
bench("trivial scan", trivial, x0)
bench("scan + [P] gather", with_gather, x0)
bench("scan + [P,32] f64 dot", with_dot64, x0)
bench("scan + [P,32] f32 dot", with_dot32, x0)
