#!/usr/bin/env python
"""Does the axon tunnel overlap host->device uploads with program
execution?  If not, pipelining cannot hide the wire and the encode
wall is upload + exec + download, serialized.

Times (a) a heavy program alone, (b) a 4 MB device_put alone, and
(c) the put issued from a second thread while the program runs.
Overlap exists iff wall(c) << wall(a) + wall(b).
"""

import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/atpu/jaxcache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

dev = jax.devices()[0]


@jax.jit
def heavy(a):
    def body(i, x):
        return jnp.tanh(x @ a)
    return jax.lax.fori_loop(0, 24, body, a)[0, :8]


a = jax.device_put(
    np.random.default_rng(0).standard_normal((4096, 4096),
                                             dtype=np.float32), dev)
jax.block_until_ready(a)
payload = np.random.randint(0, 2**31, (1 << 20,),
                            dtype=np.int64).astype(np.uint32)

jax.device_get(heavy(a))                      # compile

t0 = time.perf_counter()
jax.device_get(heavy(a))
t_exec = time.perf_counter() - t0
print("exec alone      %.1f ms" % (t_exec * 1e3), flush=True)

t0 = time.perf_counter()
x = jax.device_put(payload, dev)
jax.block_until_ready(x)
t_put = time.perf_counter() - t0
print("put 4MB alone   %.1f ms" % (t_put * 1e3), flush=True)

done = {}


def putter():
    t0 = time.perf_counter()
    y = jax.device_put(payload, dev)
    jax.block_until_ready(y)
    done["put"] = time.perf_counter() - t0


t0 = time.perf_counter()
r = heavy(a)                                  # async dispatch
th = threading.Thread(target=putter)
th.start()
jax.device_get(r)
t_exec_c = time.perf_counter() - t0
th.join()
t_total = time.perf_counter() - t0
print("concurrent: exec-visible %.1f ms, put-thread %.1f ms, "
      "total %.1f ms (serial would be %.1f ms)" %
      (t_exec_c * 1e3, done["put"] * 1e3, t_total * 1e3,
       (t_exec + t_put) * 1e3), flush=True)
