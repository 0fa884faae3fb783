"""Resampler filter-quality battery.

Pins the polyphase windowed-sinc resampler (pcmconverter.Resampler)
to the reference's SRC_SINC_BEST_QUALITY tier
(/root/reference/src/pcmconverter.c:395, src/samplerate/src_sinc.c):
passband flatness, alias rejection under decimation, image rejection
under interpolation, and swept-sine reconstruction SNR.  A filter
change that silently degrades any of these fails here — gain/peak
smoke tests alone cannot see filter quality.
"""

import io

import numpy as np
import pytest

from audiotools_tpu import pcm
from audiotools_tpu.pcmconverter import Resampler
from audiotools_tpu.pcmstream import PCMReader

BPS = 24                    # high headroom: int quantization ~-140 dB
SCALE = (1 << (BPS - 1)) - 1


def reader_for(arr, rate):
    fl = pcm.FrameList._wrap(arr.astype(np.int32), BPS)
    return PCMReader(io.BytesIO(fl.to_bytes(False, True)),
                     rate, arr.shape[1], 0x3 if arr.shape[1] == 2
                     else 0x4, BPS)


def drain(reader):
    out = []
    while True:
        fl = reader.read(65536)
        if fl.frames == 0:
            break
        out.append(fl.samples)
    return np.concatenate(out)


def tone(freq, rate, seconds=1.0, amp=0.5):
    t = np.arange(int(rate * seconds))
    return (amp * SCALE * np.sin(2 * np.pi * freq * t / rate)
            ).astype(np.int32).reshape(-1, 1)


def rms_db(x, ref=SCALE):
    r = np.sqrt(np.mean(np.asarray(x, dtype=np.float64) ** 2))
    return 20 * np.log10(max(r, 1e-30) / ref)


def steady(x, rate):
    """drops half a filter length of edge transient at each end"""
    skip = Resampler.TAPS
    return x[skip:-skip]


def test_passband_flatness_96k_to_44k():
    """tones to 0.85x the output Nyquist keep their amplitude
    (passband ripple under 0.01 dB)"""
    for freq in (440.0, 1000.0, 5000.0, 10000.0, 15000.0, 18700.0):
        out = drain(Resampler(reader_for(tone(freq, 96000), 96000),
                              44100))
        level = rms_db(steady(out, 44100)[:, 0], ref=0.5 * SCALE)
        # a pure sine's RMS is -3.01 dB from peak
        assert abs(level + 3.01) < 0.01, (freq, level)


def test_alias_rejection_96k_to_44k():
    """input energy above the input's representable band folds below
    the output Nyquist only at the filter's stopband floor"""
    for freq in (24000.0, 30000.0, 40000.0, 46000.0):
        out = drain(Resampler(reader_for(tone(freq, 96000), 96000),
                              44100))
        level = rms_db(steady(out, 44100)[:, 0])
        assert level < -120.0, (freq, level)


def test_transition_band_bounded():
    """the transition band closes within ~4% past the passband edge:
    a 23.5 kHz tone (past the output Nyquist) is fully stopped"""
    out = drain(Resampler(reader_for(tone(23500.0, 96000), 96000),
                          44100))
    level = rms_db(steady(out, 44100)[:, 0])
    assert level < -120.0, level


def test_image_rejection_44k_to_96k():
    """upsampling must not mirror the tone above the source Nyquist"""
    out = drain(Resampler(reader_for(tone(19000.0, 44100), 44100),
                          96000)).astype(np.float64)[:, 0]
    out = steady(out, 96000)
    spectrum = np.abs(np.fft.rfft(out * np.hanning(len(out))))
    freqs = np.fft.rfftfreq(len(out), d=1 / 96000)
    signal = spectrum[np.abs(freqs - 19000).argmin()]
    images = spectrum[(freqs > 23000)].max()
    assert 20 * np.log10(images / signal) < -120.0


def test_swept_sine_snr():
    """a full-band sweep reconstructs against the analytic signal at
    better than 110 dB SNR (input quantization is ~-140 dB here)"""
    rate_in, rate_out = 96000, 44100
    n = rate_in * 2
    t = np.arange(n) / rate_in
    f0, f1 = 100.0, 18000.0
    # linear chirp: phase = 2*pi*(f0*t + (f1-f0)/(2*T)*t^2)
    T = n / rate_in
    phase = 2 * np.pi * (f0 * t + (f1 - f0) / (2 * T) * t * t)
    sig = (0.5 * SCALE * np.sin(phase)).astype(np.int32).reshape(-1, 1)
    out = drain(Resampler(reader_for(sig, rate_in), rate_out))
    out = out.astype(np.float64)[:, 0]

    m = np.arange(len(out)) / rate_out
    ideal = 0.5 * SCALE * np.sin(
        2 * np.pi * (f0 * m + (f1 - f0) / (2 * T) * m * m))
    skip = Resampler.TAPS
    err = out[skip:-skip] - ideal[skip:len(out) - skip]
    snr = rms_db(ideal[skip:len(out) - skip], ref=1.0) - \
        rms_db(err, ref=1.0)
    assert snr > 110.0, snr


def test_stereo_and_streaming_consistency():
    """chunked reads equal one-shot output exactly (history logic)"""
    rng = np.random.default_rng(11)
    arr = (0.4 * SCALE * rng.standard_normal((96000, 2))
           ).astype(np.int32)
    arr = np.clip(arr, -SCALE, SCALE)
    one = drain(Resampler(reader_for(arr, 96000), 44100))
    r = Resampler(reader_for(arr, 96000), 44100)
    chunks = []
    for size in (1, 17, 443, 4096, 65536, 65536, 65536):
        fl = r.read(size)
        chunks.append(fl.samples)
    while True:
        fl = r.read(777)
        if fl.frames == 0:
            break
        chunks.append(fl.samples)
    two = np.concatenate(chunks)
    assert one.shape == two.shape
    assert np.array_equal(one, two)
