"""WavPack device decode path (ATPU_WV_DEC_BACKEND=jax): the fused
decode-chain device program must be byte-identical to the host
decorrelation (reference src/decoders/wavpack.c:2024)."""

import io
import os

import numpy as np
import pytest

from audiotools_tpu import pcm
from audiotools_tpu.formats.wavpack import WavPackAudio
from audiotools_tpu.pcmstream import PCMReader


def _signal(nch, bps, n, seed):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    base = (2000 * np.sin(2 * np.pi * 300 * t / 44100)).astype(
        np.int64)
    scale = 1 if bps >= 16 else 32
    arr = np.stack(
        [base // scale + rng.integers(-300 // scale, 300 // scale + 1,
                                      n) for _ in range(nch)], axis=1)
    return np.clip(arr, -2 ** (bps - 1),
                   2 ** (bps - 1) - 1).astype(np.int32)


def _decode(f):
    r = f.to_pcm()
    out = []
    fl = r.read(65536)
    while len(fl):
        out.append(fl.samples)
        fl = r.read(65536)
    r.close()
    return np.concatenate(out)


@pytest.mark.parametrize("nch,bps,n,comp", [
    (1, 16, 50000, "standard"),
    (2, 16, 90000, "standard"),
    (2, 16, 50000, "veryhigh"),    # 16-pass chains incl. negative terms
    (2, 24, 40000, "high"),
    (6, 16, 30000, "standard"),    # multi-block channel pairs
    (2, 8, 30000, "fast"),
])
def test_device_decode_matches_host(nch, bps, n, comp, tmp_path):
    arr = _signal(nch, bps, n, seed=n + nch)
    rd = PCMReader(
        io.BytesIO(pcm.FrameList._wrap(arr, bps)
                   .to_bytes(False, True)), 44100, nch, 0, bps)
    path = str(tmp_path / "t.wv")
    f = WavPackAudio.from_pcm(path, rd, compression=comp)
    host = _decode(f)
    os.environ["ATPU_WV_DEC_BACKEND"] = "jax"
    try:
        dev = _decode(f)
    finally:
        del os.environ["ATPU_WV_DEC_BACKEND"]
    assert np.array_equal(host, arr)
    assert np.array_equal(host, dev)
