#!/usr/bin/env python
"""Times the device FLAC decode pipeline per stage on the real chip.

Builds one production-shaped decode batch (porder-0 -8 noisy content,
the pathological case), then times: (a) the host structural scan,
(b) the Rice-decode jit alone (scan path), (c) the synthesis jit
alone, (d) the full batch jit, each steady-state.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import io
import numpy as np

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/atpu/jaxcache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench_all import make_signal, reader_for, SR
from audiotools_tpu.codecs.flac_enc_fast import encode_flac_fast
from audiotools_tpu.codecs import flac_dec_jax
from audiotools_tpu.ops import rice_decode
import jax.numpy as jnp

SECONDS = 24   # ~ 256-frame batch

arr = make_signal(SR * SECONDS)
buf = io.BytesIO()
encode_flac_fast(buf, reader_for(arr), max_lpc_order=12,
                 max_residual_partition_order=6, mid_side=True,
                 exhaustive_model_search=True, backend="numpy")
data = buf.getvalue()

dec = flac_dec_jax.JaxFlacDecoder(io.BytesIO(data))
# pull one chunk's scan via the internal path
dec_read = dec.read  # noqa

# decode normally once to warm all jits
import time as _t
t0 = _t.perf_counter()
out = dec.read(1 << 18)
print("first read: %.2fs (%d frames)" % (_t.perf_counter() - t0,
                                         out.frames), flush=True)
t0 = _t.perf_counter()
out = dec.read(1 << 18)
print("second read: %.2fs (%d frames)" % (_t.perf_counter() - t0,
                                          out.frames), flush=True)

# isolate: synthetic single big bucket shaped like the real one
P = 512          # porder-0 partitions per 256-frame stereo batch
W, C = 2048, 4096
rng = np.random.default_rng(0)
words = rng.integers(0, 1 << 32, 1 << 20, dtype=np.uint64).astype(
    np.uint32)
word_base = (np.arange(P, dtype=np.int32) * 1500)
base_bits = np.zeros(P, dtype=np.int32)
kv = np.full(P, 10, dtype=np.int32)
raw = np.full(P, -1, dtype=np.int32)
count = np.full(P, C, dtype=np.int32)


def bench(label, fn, *args, iters=4):
    jax.device_get(fn(*args))
    best = None
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.device_get(fn(*args))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print("%-28s %8.1f ms" % (label, best * 1e3), flush=True)


rice_scan = jax.jit(lambda w, wb, bb, k, r, c:
                    rice_decode.decode_partitions_scan(
                        jnp, w, wb, bb, k, r, c, W, C))
bench("rice scan-path [512x4096]", rice_scan, words, word_base,
      base_bits, kv, raw, count)

from audiotools_tpu.ops import flac_synth
S = 512
n = 4096
res = rng.integers(-2000, 2000, (S, n)).astype(np.int32)
warm = rng.integers(-500, 500, (S, flac_synth.K)).astype(np.int32)
qlp = rng.integers(-4000, 4000, (S, flac_synth.K)).astype(np.int32)
shift = np.full(S, 12, dtype=np.int32)
order = np.full(S, 8, dtype=np.int32)
syn = jax.jit(lambda r, w, q, s, o: flac_synth.synthesize(
    jnp, r, w, q, s, o, n))
bench("synthesis scan [512x4096]", syn, res, warm, qlp, shift, order)
