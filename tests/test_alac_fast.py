"""Differential tests: fast ALAC (C++ emit + shared LPC kernel) vs the
scalar oracle, plus native decoder round trips.

The fast path must produce byte-identical mdat data to ref/alac.py for
every channel count / bit depth, because both consume the same LPC
candidate tables (ops/alac_frames.py) and replicate the same adaptive
decision semantics.
"""

import io

import numpy as np
import pytest

from audiotools_tpu import pcm, _native
from audiotools_tpu.pcmstream import PCMReader
from audiotools_tpu.ref.alac import encode_mdat as oracle_mdat
from audiotools_tpu.ref.alac import ALACDecoder
from audiotools_tpu.codecs.alac_fast import (encode_mdat_fast,
                                             FastALACDecoder)

SR = 44100


def make_reader(arr, bps=16):
    fl = pcm.FrameList._wrap(arr, bps)
    mask = {1: 0x4, 2: 0x3, 6: 0x3F}.get(arr.shape[1], 0)
    return PCMReader(io.BytesIO(fl.to_bytes(False, True)),
                     SR, arr.shape[1], mask, bps)


def signal(n, ch, bps, seed=3):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    scale = (1 << (bps - 2)) // 2
    cols = [scale * np.sin(2 * np.pi * (260 + 97 * c) * t / SR) +
            rng.normal(0, scale * 0.05, n) for c in range(ch)]
    lim = (1 << (bps - 1)) - 1
    return np.clip(np.stack(cols, axis=1), -lim - 1, lim).astype(
        np.int32)


@pytest.mark.parametrize("ch,bps", [(1, 16), (2, 16), (2, 24),
                                    (6, 16)])
def test_fast_matches_oracle_bytes(ch, bps):
    arr = signal(4096 * 3 + 1357, ch, bps)
    b1 = io.BytesIO()
    oracle_mdat(b1, make_reader(arr, bps))
    b2 = io.BytesIO()
    encode_mdat_fast(b2, make_reader(arr, bps), backend="numpy",
                     batch_frames=2)
    assert b1.getvalue() == b2.getvalue()


@pytest.mark.parametrize("kind", ["silence", "constant", "fsd",
                                  "noise"])
def test_fast_matches_oracle_edge_signals(kind):
    n = 4096 * 2 + 17
    if kind == "silence":
        arr = np.zeros((n, 2), dtype=np.int32)
    elif kind == "constant":
        arr = np.full((n, 2), -12345, dtype=np.int32)
    elif kind == "fsd":
        arr = np.tile(np.asarray([[32767, -32768]], dtype=np.int32),
                      (n, 1))
        arr[::2] *= -1
    else:
        arr = np.random.default_rng(0).integers(
            -32768, 32767, (n, 2)).astype(np.int32)
    b1 = io.BytesIO()
    oracle_mdat(b1, make_reader(arr))
    b2 = io.BytesIO()
    encode_mdat_fast(b2, make_reader(arr), backend="numpy",
                     batch_frames=2)
    assert b1.getvalue() == b2.getvalue()


def test_native_decoder_roundtrip_m4a(tmp_path):
    from audiotools_tpu.formats.m4a import ALACAudio
    arr = signal(44100 * 2 + 531, 2, 16)
    path = str(tmp_path / "t.m4a")
    ALACAudio.from_pcm(path, make_reader(arr))

    dec = FastALACDecoder(path)
    out = []
    fl = dec.read(65536)
    while fl.frames:
        out.append(fl.samples)
        fl = dec.read(65536)
    got = np.concatenate(out)
    assert np.array_equal(got, arr)

    # oracle decoder agrees
    dec2 = ALACDecoder(path)
    out2 = []
    fl = dec2.read(65536)
    while fl.frames:
        out2.append(fl.samples)
        fl = dec2.read(65536)
    assert np.array_equal(np.concatenate(out2), arr)


def test_native_decoder_24bit_roundtrip(tmp_path):
    from audiotools_tpu.formats.m4a import ALACAudio
    arr = signal(4096 * 2 + 100, 2, 24)
    path = str(tmp_path / "t24.m4a")
    ALACAudio.from_pcm(path, make_reader(arr, 24))
    dec = FastALACDecoder(path)
    out = []
    fl = dec.read(65536)
    while fl.frames:
        out.append(fl.samples)
        fl = dec.read(65536)
    assert np.array_equal(np.concatenate(out), arr)
