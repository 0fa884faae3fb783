#!/usr/bin/env python
"""Measures a device decode path end-to-end on the real chip against
the host decoder (byte-exact + realtime-x), for any lossless codec.

Usage: python tools_dev/bench_dec_sweep.py <codec> [seconds] [trials]
       codec in {flac, alac, tta, wavpack, shn}
"""

import io
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

from bench_all import make_signal, reader_for, SR

CODEC = sys.argv[1] if len(sys.argv) > 1 else "alac"
SECONDS = int(sys.argv[2]) if len(sys.argv) > 2 else 30
TRIALS = int(sys.argv[3]) if len(sys.argv) > 3 else 3

FORMATS = {
    "flac": ("audiotools_tpu.formats.flac", "FlacAudio", ".flac",
             "ATPU_FLAC_DEC_BACKEND"),
    "alac": ("audiotools_tpu.formats.m4a", "ALACAudio", ".m4a",
             "ATPU_ALAC_DEC_BACKEND"),
    "tta": ("audiotools_tpu.formats.tta", "TrueAudio", ".tta",
            "ATPU_TTA_DEC_BACKEND"),
    "wavpack": ("audiotools_tpu.formats.wavpack", "WavPackAudio",
                ".wv", "ATPU_WV_DEC_BACKEND"),
    "shn": ("audiotools_tpu.formats.shn", "ShortenAudio", ".shn",
            "ATPU_SHN_DEC_BACKEND"),
}

(mod_name, cls_name, ext, env) = FORMATS[CODEC]
import importlib
cls = getattr(importlib.import_module(mod_name), cls_name)

arr = make_signal(SR * SECONDS)
path = "/tmp/bench_dec_sweep" + ext
t0 = time.perf_counter()
kwargs = {}
if CODEC == "shn":
    kwargs["total_pcm_frames"] = arr.shape[0]
f = cls.from_pcm(path, reader_for(arr), **kwargs)
print("encoded %d s in %.2f s -> %.2f MB" %
      (SECONDS, time.perf_counter() - t0,
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


timed("host")
os.environ[env] = "jax"
try:
    timed("device")
finally:
    del os.environ[env]
