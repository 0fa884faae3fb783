"""Shorten / TTA codec and AIFF / AU container tests.

Modeled on the reference per-format suites (test_formats.py:5100 SHN,
TTA; test_core.py AIFF chunks): fixture decoding with CRC verification,
encoder/decoder roundtrips, and container conversions.
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
    mask = {1: 4, 2: 3}.get(arr.shape[1], 0)
    return PCMReader(io.BytesIO(fl.to_bytes(False, True)),
                     sr, arr.shape[1], mask, bps)


def decode_all(reader):
    out = []
    f = reader.read(1 << 17)
    while len(f) > 0:
        out.append(f.samples)
        f = reader.read(1 << 17)
    return (np.concatenate(out, axis=0) if out
            else np.zeros((0, 1), dtype=np.int32))


def sines(n, ch=2):
    t = np.arange(n)
    return np.stack([(8000 * np.sin(t * 0.01 * (c + 1)) +
                      1000 * np.sin(t * 0.037)).astype(np.int32)
                     for c in range(ch)], axis=1)


# ---------------------------------------------------------------- shorten --

@pytest.mark.skipif(not reference_available(), reason="no fixtures")
@pytest.mark.parametrize("fixture", ["shorten-frames.shn",
                                     "shorten-lpc.shn"])
def test_shn_decode_fixtures(fixture):
    from audiotools_tpu.formats.shn import ShortenAudio
    s = ShortenAudio(os.path.join(REF_TEST, fixture))
    decoded = decode_all(s.to_pcm())
    assert decoded.shape[0] == s.total_frames()


@pytest.mark.parametrize("signal,bps", [("sines", 16), ("zeros", 16),
                                        ("wasted", 16), ("small8", 8)])
def test_shn_roundtrip(signal, bps):
    from audiotools_tpu.formats.shn import ShortenAudio
    if signal == "sines":
        arr = sines(5000)
    elif signal == "zeros":
        arr = np.concatenate([np.zeros((1000, 2), np.int32),
                              sines(2000)])
    elif signal == "wasted":
        arr = sines(3000) & ~7
    else:
        arr = (sines(3000) >> 9).astype(np.int32)

    tmp = tempfile.mktemp(suffix=".shn")
    try:
        s = ShortenAudio.from_pcm(tmp, make_reader(arr, bps=bps),
                                  total_pcm_frames=len(arr))
        assert np.array_equal(decode_all(s.to_pcm()), arr)
        assert s.total_frames() == len(arr)
        assert s.bits_per_sample() == bps
        assert type(at.open(tmp)) is ShortenAudio
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def test_shn_wave_header_footer_roundtrip():
    from audiotools_tpu.formats.shn import ShortenAudio
    from audiotools_tpu.formats.wav import WaveAudio

    arr = sines(4000)
    tmp_wav = tempfile.mktemp(suffix=".wav")
    tmp_shn = tempfile.mktemp(suffix=".shn")
    tmp_wav2 = tempfile.mktemp(suffix=".wav")
    try:
        wav = WaveAudio.from_pcm(tmp_wav, make_reader(arr))
        shn = wav.convert(tmp_shn, ShortenAudio)
        assert at.pcm_cmp(wav.to_pcm(), shn.to_pcm())
        # wave header must be recoverable from the VERBATIM chunks
        (header, footer) = shn.wave_header_footer()
        assert header[0:4] == b"RIFF"
        wav2 = shn.convert(tmp_wav2, WaveAudio)
        with open(tmp_wav, "rb") as f1, open(tmp_wav2, "rb") as f2:
            assert f1.read() == f2.read()
    finally:
        for p in (tmp_wav, tmp_shn, tmp_wav2):
            if os.path.exists(p):
                os.unlink(p)


# -------------------------------------------------------------------- tta --

@pytest.mark.skipif(not reference_available(), reason="no fixtures")
def test_tta_decode_fixture():
    from audiotools_tpu.formats.tta import TrueAudio
    t = TrueAudio(os.path.join(REF_TEST, "trueaudio.tta"))
    decoded = decode_all(t.to_pcm())
    assert decoded.shape[0] == t.total_frames()


@pytest.mark.skipif(not reference_available(), reason="no fixtures")
def test_tta_id3_wrapped_fixture():
    from audiotools_tpu.formats.tta import TrueAudio
    t = TrueAudio(os.path.join(REF_TEST, "tta-id3-2.tta"))
    decoded = decode_all(t.to_pcm())
    assert decoded.shape[0] == t.total_frames()


@pytest.mark.parametrize("ch", [1, 2, 4])
def test_tta_roundtrip(ch):
    from audiotools_tpu.formats.tta import TrueAudio
    arr = sines(9000, ch)
    tmp = tempfile.mktemp(suffix=".tta")
    try:
        # low sample rate keeps TTA frames small for the scalar oracle
        t = TrueAudio.from_pcm(tmp, make_reader(arr, sr=8000),
                               total_pcm_frames=len(arr))
        assert np.array_equal(decode_all(t.to_pcm()), arr)
        assert type(at.open(tmp)) is TrueAudio
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def test_tta_roundtrip_24bit():
    from audiotools_tpu.formats.tta import TrueAudio
    rng = np.random.default_rng(3)
    arr = (sines(6000).astype(np.int64) * 200 +
           rng.integers(-1000, 1000, (6000, 2))).astype(np.int32)
    tmp = tempfile.mktemp(suffix=".tta")
    try:
        t = TrueAudio.from_pcm(tmp, make_reader(arr, sr=8000, bps=24),
                               total_pcm_frames=len(arr))
        assert np.array_equal(decode_all(t.to_pcm()), arr)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


# ----------------------------------------------------------------- aiff/au --

@pytest.mark.skipif(not reference_available(), reason="no fixtures")
@pytest.mark.parametrize("fixture", ["aiff-1ch.aiff", "aiff-2ch.aiff",
                                     "aiff-6ch.aiff", "aiff-8bit.aiff"])
def test_aiff_fixtures(fixture):
    from audiotools_tpu.formats.aiff import AiffAudio
    a = AiffAudio(os.path.join(REF_TEST, fixture))
    decoded = decode_all(a.to_pcm())
    assert decoded.shape[0] == a.total_frames()
    assert decoded.shape[1] == a.channels()


def test_aiff_roundtrip():
    from audiotools_tpu.formats.aiff import AiffAudio
    arr = sines(4000)
    tmp = tempfile.mktemp(suffix=".aiff")
    try:
        a = AiffAudio.from_pcm(tmp, make_reader(arr))
        assert np.array_equal(decode_all(a.to_pcm()), arr)
        assert a.total_frames() == 4000
        assert a.sample_rate() == 44100
        assert type(at.open(tmp)) is AiffAudio
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def test_aiff_ieee_extended():
    from audiotools_tpu.formats.aiff import (parse_ieee_extended,
                                             build_ieee_extended)
    for rate in [8000, 22050, 44100, 48000, 96000, 192000, 11025]:
        assert parse_ieee_extended(build_ieee_extended(rate)) == rate


def test_au_roundtrip():
    from audiotools_tpu.formats.au import AuAudio
    arr = sines(3000)
    tmp = tempfile.mktemp(suffix=".au")
    try:
        a = AuAudio.from_pcm(tmp, make_reader(arr))
        assert np.array_equal(decode_all(a.to_pcm()), arr)
        assert type(at.open(tmp)) is AuAudio
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def test_cross_format_conversion_matrix():
    """every lossless format converts to every other bit-exactly"""
    from audiotools_tpu.formats.wav import WaveAudio
    from audiotools_tpu.formats.aiff import AiffAudio
    from audiotools_tpu.formats.flac import FlacAudio
    from audiotools_tpu.formats.shn import ShortenAudio
    from audiotools_tpu.formats.au import AuAudio

    classes = [WaveAudio, AiffAudio, FlacAudio, ShortenAudio, AuAudio]
    arr = sines(3000)
    src = tempfile.mktemp(suffix=".wav")
    tmps = []
    try:
        origin = WaveAudio.from_pcm(src, make_reader(arr))
        for cls in classes:
            tmp = tempfile.mktemp(suffix="." + cls.SUFFIX)
            tmps.append(tmp)
            converted = origin.convert(tmp, cls)
            assert at.pcm_cmp(origin.to_pcm(), converted.to_pcm()), \
                cls.NAME
    finally:
        for p in [src] + tmps:
            if os.path.exists(p):
                os.unlink(p)
