"""TTA device decode path (ATPU_TTA_DEC_BACKEND=jax): host adaptive-
Rice unpack + fused device filter inversion must be byte-identical to
the host decoder.

Role of reference test_formats.py's TTA round-trips, applied to the
decode backend split (reference src/decoders/tta.c:849)."""

import io
import os

import numpy as np
import pytest

from audiotools_tpu import pcm
from audiotools_tpu.formats.tta import TrueAudio
from audiotools_tpu.pcmstream import PCMReader


def _roundtrip(arr, bps, tmp_path, backend_env):
    nch = arr.shape[1]
    rd = PCMReader(
        io.BytesIO(pcm.FrameList._wrap(arr, bps)
                   .to_bytes(False, True)),
        44100, nch, 0, bps)
    path = str(tmp_path / ("t%d.tta" % (bps,)))
    f = TrueAudio.from_pcm(path, rd)
    old = os.environ.get("ATPU_TTA_DEC_BACKEND")
    if backend_env:
        os.environ["ATPU_TTA_DEC_BACKEND"] = backend_env
    try:
        r = f.to_pcm()
        out = []
        fl = r.read(65536)
        while len(fl):
            out.append(fl.samples)
            fl = r.read(65536)
        r.close()
    finally:
        if backend_env:
            if old is None:
                del os.environ["ATPU_TTA_DEC_BACKEND"]
            else:
                os.environ["ATPU_TTA_DEC_BACKEND"] = old
    return np.concatenate(out)


def _signal(nch, bps, n, seed):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    base = (3000 * np.sin(2 * np.pi * 440 * t / 44100)).astype(
        np.int64)
    scale = 1 if bps >= 16 else 64
    arr = np.stack(
        [base // scale + rng.integers(-200 // scale, 200 // scale + 1,
                                      n) for _ in range(nch)], axis=1)
    return np.clip(arr, -2 ** (bps - 1),
                   2 ** (bps - 1) - 1).astype(np.int32)


@pytest.mark.parametrize("nch,bps,n", [
    (1, 16, 100000),
    (2, 16, 130000),     # multiple frames + partial tail
    (2, 24, 60000),
    (4, 16, 46000),
    (2, 8, 46000),
])
def test_device_decode_matches_host(nch, bps, n, tmp_path):
    arr = _signal(nch, bps, n, seed=n + nch)
    host = _roundtrip(arr, bps, tmp_path, None)
    dev = _roundtrip(arr, bps, tmp_path, "jax")
    assert np.array_equal(host, arr)
    assert np.array_equal(host, dev)


def test_device_decode_seek(tmp_path):
    """seek through the device decoder stays sample-exact"""
    arr = _signal(2, 16, 120000, seed=3)
    rd = PCMReader(
        io.BytesIO(pcm.FrameList._wrap(arr, 16)
                   .to_bytes(False, True)), 44100, 2, 0, 16)
    path = str(tmp_path / "seek.tta")
    f = TrueAudio.from_pcm(path, rd)
    os.environ["ATPU_TTA_DEC_BACKEND"] = "jax"
    try:
        r = f.to_pcm()
        pos = r.seek(50000)
        fl = r.read(4096)
        r.close()
    finally:
        del os.environ["ATPU_TTA_DEC_BACKEND"]
    got = fl.samples
    assert got.shape[0] > 0
    assert np.array_equal(got, arr[pos:pos + got.shape[0]])
