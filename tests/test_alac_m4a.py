"""ALAC codec and M4A container tests.

Modeled on the reference ALAC suite (test_formats.py:2668-2700):
fixture decode, roundtrips at 16/24-bit and 1-6 channels, M4A atom
metadata handling.
"""

import io
import os
import tempfile

import numpy as np
import pytest

import audiotools_tpu as at
from audiotools_tpu import pcm
from audiotools_tpu.pcmstream import PCMReader

from conftest import reference_available

REF_TEST = "/root/reference/test"


def make_reader(arr, sr=44100, bps=16):
    arr = np.asarray(arr, dtype=np.int32)
    if arr.ndim == 1:
        arr = arr.reshape(-1, 1)
    fl = pcm.FrameList._wrap(arr, bps)
    mask = {1: 4, 2: 3, 3: 0x7, 6: 0x3F}.get(arr.shape[1], 0)
    return PCMReader(io.BytesIO(fl.to_bytes(False, True)),
                     sr, arr.shape[1], mask, bps)


def sines(n, ch=2, amp=8000):
    t = np.arange(n)
    return np.stack([(amp * np.sin(t * 0.011 * (c + 1))).astype(
        np.int32) for c in range(ch)], axis=1)


@pytest.mark.skipif(not reference_available(), reason="no fixtures")
def test_decode_fixture():
    from audiotools_tpu.ref.alac import ALACDecoder
    d = ALACDecoder(os.path.join(REF_TEST, "alac-allframes.m4a"))
    total = 0
    f = d.read(1 << 17)
    while len(f) > 0:
        total += f.frames
        f = d.read(1 << 17)
    assert total == 40


@pytest.mark.parametrize("bps", [16, 24])
@pytest.mark.parametrize("ch", [1, 2, 6])
def test_roundtrip(bps, ch):
    from audiotools_tpu.formats.m4a import ALACAudio
    arr = sines(9000, ch, amp=(8000 if bps == 16 else 800000))
    tmp = tempfile.mktemp(suffix=".m4a")
    try:
        a = ALACAudio.from_pcm(tmp, make_reader(arr, bps=bps))
        assert at.pcm_cmp(make_reader(arr, bps=bps), a.to_pcm())
        assert a.total_frames() == 9000
        assert a.bits_per_sample() == bps
        assert a.channels() == ch
        assert a.sample_rate() == 44100
        assert type(at.open(tmp)) is ALACAudio
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def test_roundtrip_extremes():
    from audiotools_tpu.formats.m4a import ALACAudio
    cases = [np.zeros((5000, 2), dtype=np.int32),
             np.tile(np.array([[32767, -32768]], dtype=np.int32),
                     (3000, 1))]
    for arr in cases:
        tmp = tempfile.mktemp(suffix=".m4a")
        try:
            a = ALACAudio.from_pcm(tmp, make_reader(arr))
            assert at.pcm_cmp(make_reader(arr), a.to_pcm())
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)


def test_metadata():
    from audiotools_tpu.formats.m4a import ALACAudio
    arr = sines(6000)
    tmp = tempfile.mktemp(suffix=".m4a")
    try:
        a = ALACAudio.from_pcm(tmp, make_reader(arr))
        a.set_metadata(at.MetaData(track_name="Name", track_number=3,
                                   track_total=10, album_name="Album",
                                   year="2026"))
        got = at.open(tmp).get_metadata()
        assert got.track_name == "Name"
        assert got.track_number == 3
        assert got.track_total == 10
        assert got.album_name == "Album"
        assert got.year == "2026"
        # stream must still decode after the metadata rewrite
        assert at.pcm_cmp(make_reader(arr), at.open(tmp).to_pcm())

        # delete
        at.open(tmp).delete_metadata()
        got = at.open(tmp).get_metadata()
        assert got.track_name is None
        assert at.pcm_cmp(make_reader(arr), at.open(tmp).to_pcm())
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
