#!/usr/bin/env python
"""Measures the WavPack DEVICE decode path (ATPU_WV_DEC_BACKEND=jax)
end-to-end on the real chip: a 30 s stereo file, wall-clock
realtime-x, byte-exact vs the host decoder.

Usage: python tools_dev/bench_wv_decode.py [seconds] [trials] [comp]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

from bench_all import make_signal, reader_for, SR
from audiotools_tpu.formats.wavpack import WavPackAudio

SECONDS = int(sys.argv[1]) if len(sys.argv) > 1 else 30
TRIALS = int(sys.argv[2]) if len(sys.argv) > 2 else 4
COMP = sys.argv[3] if len(sys.argv) > 3 else "standard"

arr = make_signal(SR * SECONDS)
path = "/tmp/bench_wv_decode.wv"
t0 = time.perf_counter()
f = WavPackAudio.from_pcm(path, reader_for(arr), compression=COMP)
print("encoded %d s (%s) in %.2f s -> %.2f MB" %
      (SECONDS, COMP, time.perf_counter() - t0,
       os.path.getsize(path) / 1e6), flush=True)


def decode_all():
    r = f.to_pcm()
    out = []
    fl = r.read(1 << 18)
    while len(fl):
        out.append(fl.samples)
        fl = r.read(1 << 18)
    r.close()
    return np.concatenate(out)


def timed(label):
    t0 = time.perf_counter()
    first = decode_all()
    warm = time.perf_counter() - t0
    assert np.array_equal(first, arr), "%s decode mismatch" % label
    best = None
    for _ in range(TRIALS):
        t0 = time.perf_counter()
        got = decode_all()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    assert np.array_equal(got, arr)
    print("%s: first %.2f s, best %.2f s -> %.1fx realtime "
          "(%.1f Msamples/s)" %
          (label, warm, best, SECONDS / best,
           SECONDS * SR * 2 / best / 1e6), flush=True)
    return best


timed("host")
os.environ["ATPU_WV_DEC_BACKEND"] = "jax"
try:
    timed("device (batched, B=%s)" %
          os.environ.get("ATPU_WV_DEC_BATCH", "32"))
finally:
    del os.environ["ATPU_WV_DEC_BACKEND"]
