"""Oracle escape hatches: every codec's ATPU_*_ORACLE=1 env forces
the scalar reference path, and its output must match the fast path
byte-for-byte (the dual-implementation invariant the dispatch layer
promises)."""

import io

import numpy as np
import pytest

from audiotools_tpu import pcm
from audiotools_tpu.pcmstream import PCMReader

SR = 44100
N = 4096 * 3 + 333


def make_reader():
    rng = np.random.default_rng(13)
    t = np.arange(N)
    arr = np.clip(np.stack([
        5000 * np.sin(2 * np.pi * 440 * t / SR) +
        rng.normal(0, 300, N),
        4500 * np.sin(2 * np.pi * 550 * t / SR)], 1),
        -32768, 32767).astype(np.int32)
    fl = pcm.FrameList._wrap(arr, 16)
    return (PCMReader(io.BytesIO(fl.to_bytes(False, True)),
                      SR, 2, 3, 16), arr)


CASES = [
    ("ATPU_FLAC_ORACLE", "flac"),
    ("ATPU_ALAC_ORACLE", "alac"),
    ("ATPU_SHN_ORACLE", "shn"),
    ("ATPU_TTA_ORACLE", "tta"),
]


def encode(kind, tmp_path, name):
    (reader, arr) = make_reader()
    if kind == "flac":
        from audiotools_tpu.formats.flac import FlacAudio as cls
    elif kind == "alac":
        from audiotools_tpu.formats.m4a import ALACAudio as cls
    elif kind == "shn":
        from audiotools_tpu.formats.shn import ShortenAudio as cls
    else:
        from audiotools_tpu.formats.tta import TrueAudio as cls
    path = str(tmp_path / (name + "." + cls.SUFFIX))
    cls.from_pcm(path, reader)
    return (open(path, "rb").read(), arr, cls, path)


@pytest.mark.parametrize("env,kind", CASES)
def test_oracle_matches_fast_encode(env, kind, tmp_path, monkeypatch):
    (fast_bytes, arr, cls, _p) = encode(kind, tmp_path, "fast")
    monkeypatch.setenv(env, "1")
    (oracle_bytes, _, _, _) = encode(kind, tmp_path, "oracle")
    if kind == "alac":
        # the m4a wrapper stamps a creation date; compare mdat only
        def mdat(b):
            i = b.find(b"mdat")
            return b[i:] if i >= 0 else b
        assert mdat(oracle_bytes) == mdat(fast_bytes)
    else:
        assert oracle_bytes == fast_bytes


@pytest.mark.parametrize("env,kind", CASES)
def test_oracle_decoder_matches_fast(env, kind, tmp_path, monkeypatch):
    (_bytes, arr, cls, path) = encode(kind, tmp_path, "dec")

    def drain(track):
        r = track.to_pcm()
        out = []
        fl = r.read(1 << 18)
        while fl.frames:
            out.append(fl.samples)
            fl = r.read(1 << 18)
        r.close()
        return np.concatenate(out)

    fast = drain(cls(path))
    monkeypatch.setenv(env, "1")
    slow = drain(cls(path))
    assert np.array_equal(fast, slow)
    assert np.array_equal(fast, arr)
