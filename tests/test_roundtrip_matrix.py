"""The parameterized lossless round-trip matrix: every lossless
format x channel count x bit depth over deterministic sine/pattern
streams (mirrors reference test_formats.py:853 LosslessFileTest),
plus full-scale-deflection and wasted-bits edge signals and
error-injection behavior."""

import os

import numpy as np
import pytest

from audiotools_tpu import sines
from audiotools_tpu.pcmstream import pcm_frame_cmp

SR = 44100
N = SR // 2        # half a second per case keeps the matrix quick


def _formats():
    from audiotools_tpu.formats.wav import WaveAudio
    from audiotools_tpu.formats.aiff import AiffAudio
    from audiotools_tpu.formats.au import AuAudio
    from audiotools_tpu.formats.flac import FlacAudio, OggFlacAudio
    from audiotools_tpu.formats.tta import TrueAudio
    from audiotools_tpu.formats.wavpack import WavPackAudio
    from audiotools_tpu.formats.shn import ShortenAudio
    from audiotools_tpu.formats.m4a import ALACAudio
    return {
        "wav": (WaveAudio, (8, 16, 24), (1, 2, 3, 4, 5, 6, 8)),
        "aiff": (AiffAudio, (8, 16, 24), (1, 2, 3, 4, 5, 6, 8)),
        "au": (AuAudio, (8, 16, 24), (1, 2)),
        "flac": (FlacAudio, (8, 16, 24), (1, 2, 3, 4, 5, 6, 8)),
        "oggflac": (OggFlacAudio, (16,), (1, 2)),
        "tta": (TrueAudio, (8, 16, 24), (1, 2, 3, 4, 5, 6, 8)),
        "wavpack": (WavPackAudio, (8, 16, 24), (1, 2, 3, 4, 5, 6, 8)),
        "shn": (ShortenAudio, (8, 16), (1, 2)),
        "alac": (ALACAudio, (16, 24), (1, 2, 3, 4, 5, 6, 8)),
    }


def make_stream(channels, bits_per_sample, mask=None):
    lim = (1 << (bits_per_sample - 2)) - 1
    if mask is None:
        mask = {1: 0x4, 2: 0x3, 3: 0x7, 4: 0x33, 5: 0x37,
                6: 0x3F, 8: 0x63F}[channels]
    specs = [(lim // (c + 1), 220 * (c + 1)) for c in range(channels)]
    return sines.Simple_Sine(N, SR, mask, bits_per_sample, *specs)


def decode_all(reader):
    out = []
    fl = reader.read(65536)
    while fl.frames:
        out.append(fl.samples)
        fl = reader.read(65536)
    reader.close()
    return (np.concatenate(out) if out
            else np.zeros((0, 1), np.int32))


CASES = [(name, bps, ch)
         for (name, (_cls, bpss, chs)) in sorted(_formats().items())
         for bps in bpss
         for ch in chs]


@pytest.mark.parametrize("name,bps,ch", CASES)
def test_lossless_roundtrip(tmp_path, name, bps, ch):
    (cls, _bpss, _chs) = _formats()[name]
    mask = None
    if name == "flac" and ch == 8:
        # FLAC defines no 8-channel WAVE mask (reference flac.py:1781
        # whitelist); >6 channels encode with an undefined mask, like
        # the reference's from_pcm does for maskless readers
        mask = 0
    elif name == "alac" and ch == 4:
        # ALAC constrains channel masks to its layout table
        mask = 0x0107
    elif name == "alac" and ch == 8:
        mask = 0x00FF
    stream = make_stream(ch, bps, mask)
    reference = decode_all(make_stream(ch, bps, mask))
    path = str(tmp_path / ("t." + cls.SUFFIX))
    track = cls.from_pcm(path, stream)
    assert track.bits_per_sample() == bps
    assert track.channels() == ch
    assert track.total_frames() == N
    decoded = decode_all(track.to_pcm())
    assert decoded.shape == reference.shape, (name, bps, ch)
    assert np.array_equal(decoded, reference), (name, bps, ch)


@pytest.mark.parametrize("name", ["flac", "tta", "wavpack"])
@pytest.mark.parametrize("pattern", [sines.PATTERN01, sines.PATTERN04,
                                     sines.PATTERN07])
def test_full_scale_deflection(tmp_path, name, pattern):
    """full-scale patterns survive every 16-bit lossless codec"""
    (cls, _bpss, _chs) = _formats()[name]
    scaled = sines.scale_pattern(pattern, 16)
    stream = sines.PatternReader(16, scaled, 1000)
    reference = decode_all(sines.PatternReader(16, scaled, 1000))
    path = str(tmp_path / ("t." + cls.SUFFIX))
    cls.from_pcm(path, stream)
    decoded = decode_all(cls(path).to_pcm())
    assert np.array_equal(decoded, reference), name


@pytest.mark.parametrize("name", ["flac", "wavpack"])
def test_wasted_bps(tmp_path, name):
    """streams with constant zero low bits round-trip"""
    (cls, _bpss, _chs) = _formats()[name]
    stream = sines.WastedBPS16(N)
    reference = decode_all(sines.WastedBPS16(N))
    path = str(tmp_path / ("t." + cls.SUFFIX))
    cls.from_pcm(path, stream)
    decoded = decode_all(cls(path).to_pcm())
    assert np.array_equal(decoded, reference), name


@pytest.mark.parametrize("name", ["flac", "tta", "wavpack", "alac"])
def test_error_injection(tmp_path, name):
    """a PCMReader raising mid-stream must not leave output behind"""
    (cls, _bpss, _chs) = _formats()[name]
    path = str(tmp_path / ("t." + cls.SUFFIX))
    from audiotools_tpu import EncodingError
    with pytest.raises((EncodingError, ValueError, IOError)):
        cls.from_pcm(path, sines.ERROR_PCM_Reader(
            ValueError("injected failure")))


def test_pcm_frame_cmp_oracle():
    """pcm_frame_cmp is the universal equality oracle"""
    a = sines.Sine_Stereo(16, N, SR, 441.0, 0.6, 661.5, 0.3)
    b = sines.Sine_Stereo(16, N, SR, 441.0, 0.6, 661.5, 0.3)
    assert pcm_frame_cmp(a, b) is None
    c = sines.Sine_Stereo(16, N, SR, 441.0, 0.6, 661.5, 0.3)
    d = sines.Sine_Stereo(16, N, SR, 442.0, 0.6, 661.5, 0.3)
    assert pcm_frame_cmp(c, d) is not None
