"""PCM converter suite and ReplayGain tests.

Modeled on reference test_core.py:838 (PCMConverter) and :944,4289
(ReplayGain).
"""

import io

import numpy as np
import pytest

from audiotools_tpu import pcm
from audiotools_tpu.pcmstream import PCMReader, PCMConverter
from audiotools_tpu.pcmconverter import (Averager, Downmixer, Resampler,
                                         BPSConverter)


def make_reader(arr, sr=44100, bps=16, mask=None):
    arr = np.asarray(arr, dtype=np.int32)
    if arr.ndim == 1:
        arr = arr.reshape(-1, 1)
    fl = pcm.FrameList._wrap(arr, bps)
    if mask is None:
        mask = {1: 4, 2: 3, 6: 0x3F}.get(arr.shape[1], 0)
    return PCMReader(io.BytesIO(fl.to_bytes(False, True)),
                     sr, arr.shape[1], mask, bps)


def read_all(reader):
    out = []
    f = reader.read(1 << 17)
    while len(f) > 0:
        out.append(f.samples)
        f = reader.read(1 << 17)
    return np.concatenate(out, axis=0) if out else np.zeros((0, 1))


def test_averager():
    arr = np.array([[10, 20], [-7, -8], [1, 2]], dtype=np.int32)
    out = read_all(Averager(make_reader(arr)))
    # C-style truncation toward zero: (-7 + -8)/2 = -7
    assert out[:, 0].tolist() == [15, -7, 1]


def test_downmixer_stereo_passthrough_weights():
    # pure front left/right pass through unchanged
    arr = np.zeros((4, 6), dtype=np.int32)
    arr[:, 0] = [100, -100, 50, 0]     # fL
    arr[:, 1] = [7, 8, 9, 10]          # fR
    out = read_all(Downmixer(make_reader(arr, mask=0x3F)))
    assert out[:, 0].tolist() == [100, -100, 50, 0]
    assert out[:, 1].tolist() == [7, 8, 9, 10]


def test_downmixer_center_and_rear():
    arr = np.zeros((1, 6), dtype=np.int32)
    arr[0, 2] = 1000     # center
    arr[0, 4] = 500      # back left
    out = read_all(Downmixer(make_reader(arr, mask=0x3F)))
    # left = 0 + 0.6*0.7*500 + 0.7*1000 = 910; right = 0-210+700=490
    assert out[0, 0] == 910
    assert out[0, 1] == 490


def test_bps_converter_increase():
    arr = np.array([[100], [-100]], dtype=np.int32)
    out = read_all(BPSConverter(make_reader(arr, bps=16), 24))
    assert out[:, 0].tolist() == [100 << 8, -100 << 8]


def test_bps_converter_decrease():
    arr = np.array([[10000], [-10000], [255]], dtype=np.int32)
    out = read_all(BPSConverter(make_reader(arr, bps=16), 8))
    # 1-bit dither XOR means values within 1 of the shifted value
    expected = np.array([10000 >> 8, -10000 >> 8, 0])
    assert np.all(np.abs(out[:, 0] - expected) <= 1)


def test_resampler_tone_preservation():
    """a pure tone must survive resampling with its frequency intact"""
    sr_in, sr_out = 44100, 48000
    n = sr_in  # one second
    t = np.arange(n)
    freq = 1000.0
    arr = (20000 * np.sin(2 * np.pi * freq * t / sr_in)).astype(
        np.int32).reshape(-1, 1)
    out = read_all(Resampler(make_reader(arr, sr=sr_in), sr_out))
    # length within a frame or two of the ideal count
    expected_len = n * sr_out // sr_in
    assert abs(len(out) - expected_len) <= 2

    # measure dominant frequency via FFT on the steady-state interior
    interior = out[2000:-2000, 0].astype(np.float64)
    spectrum = np.abs(np.fft.rfft(interior * np.hanning(len(interior))))
    peak_bin = np.argmax(spectrum)
    measured = peak_bin * sr_out / len(interior)
    assert abs(measured - freq) < 5.0

    # amplitude preserved within 5%
    assert abs(np.max(np.abs(interior)) / 20000.0 - 1.0) < 0.05


def test_resampler_downsample():
    sr_in, sr_out = 96000, 44100
    n = sr_in // 2
    t = np.arange(n)
    arr = (15000 * np.sin(2 * np.pi * 440 * t / sr_in)).astype(
        np.int32).reshape(-1, 1)
    out = read_all(Resampler(make_reader(arr, sr=sr_in), sr_out))
    expected_len = n * sr_out // sr_in
    assert abs(len(out) - expected_len) <= 2
    interior = out[1000:-1000, 0].astype(np.float64)
    spectrum = np.abs(np.fft.rfft(interior * np.hanning(len(interior))))
    measured = np.argmax(spectrum) * sr_out / len(interior)
    assert abs(measured - 440.0) < 5.0


def test_pcm_converter_chain():
    """PCMConverter wires up the full conversion chain"""
    arr = np.stack([np.arange(-500, 500, dtype=np.int32) * 30] * 6,
                   axis=1)
    out_reader = PCMConverter(make_reader(arr, mask=0x3F),
                              22050, 2, 0x3, 24)
    assert out_reader.sample_rate == 22050
    assert out_reader.channels == 2
    assert out_reader.bits_per_sample == 24
    out = read_all(out_reader)
    assert out.shape[1] == 2
    assert len(out) > 0


def test_replaygain_sine_level():
    """a -20 dBFS-ish sine should get positive suggested gain"""
    from audiotools_tpu.replaygain import ReplayGain
    n = 44100 * 2
    t = np.arange(n)
    arr = np.stack([
        (3276 * np.sin(2 * np.pi * 1000 * t / 44100)),
        (3276 * np.sin(2 * np.pi * 1000 * t / 44100))],
        axis=1).astype(np.int32)
    rg = ReplayGain(44100)
    (gain, peak) = rg.title_gain(make_reader(arr))
    assert 0.09 < peak < 0.11
    assert gain > 0    # quiet signal needs boost
    # louder version needs ~12dB less
    rg2 = ReplayGain(44100)
    (gain2, _) = rg2.title_gain(make_reader(
        np.clip(arr * 4, -32768, 32767).astype(np.int32)))
    assert 11.0 < (gain - gain2) < 13.0


def test_replaygain_album_accumulation():
    from audiotools_tpu.replaygain import ReplayGain
    rng = np.random.default_rng(0)
    arr = rng.normal(0, 2000, (44100, 2)).astype(np.int32)
    rg = ReplayGain(44100)
    (g1, p1) = rg.title_gain(make_reader(arr))
    (g2, p2) = rg.title_gain(make_reader(
        (arr // 4).astype(np.int32)))
    (ag, ap) = rg.album_gain()
    assert min(g1, g2) <= ag <= max(g1, g2)
    assert ap == max(p1, p2)


def test_replaygain_reader_applies_gain():
    from audiotools_tpu.replaygain import ReplayGainReader
    arr = np.full((1000, 2), 1000, dtype=np.int32)
    r = ReplayGainReader(make_reader(arr), 6.0, 0.1)
    out = read_all(r)
    # +6 dB ~= 2x
    assert abs(float(np.mean(out)) / 2000.0 - 1.0) < 0.01
