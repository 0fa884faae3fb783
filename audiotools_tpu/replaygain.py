"""ReplayGain loudness analysis and application.

Rebuild of the reference ReplayGain module
(``/root/reference/src/replaygain.c``, itself the classic ReplayGain 1.0
reference analysis): per-rate 10th-order Yulewalk + 2nd-order
Butterworth equal-loudness filtering, 50 ms RMS windows, a 0.01 dB
histogram and the 95th-percentile statistic against the pink-noise
reference level, plus ReplayGainReader which applies gain with peak
protection and 1-bit dither.

Filters run as vectorized IIR scans (scipy.signal.lfilter when present,
a scalar fallback otherwise); windowed RMS accumulation and the
histogram are pure NumPy.
"""

from __future__ import annotations

import numpy as np

from . import pcm as pcm_mod
from .ops.replaygain_coeffs import YULE, BUTTER, SAMPLE_RATES

RMS_WINDOW_TIME = 0.05
STEPS_PER_DB = 100.0
MAX_DB = 120.0
RMS_PERCENTILE = 0.95
PINK_REF = 64.82

MAX_ORDER = 10


def _lfilter(b, a, x, zi):
    """IIR filter with state (direct form II transposed);
    returns (y, zf)

    runs through the native kernel (``atpu_iir``) — a sequential
    recurrence is host work, and this avoids both a scipy import
    (~2.5 s of process start) and the scalar-Python fallback"""
    try:
        from . import _native
        import ctypes
        lib = _native.get_lib()
        b = np.ascontiguousarray(b, dtype=np.float64)
        a = np.ascontiguousarray(a, dtype=np.float64)
        x = np.ascontiguousarray(x, dtype=np.float64)
        y = np.empty_like(x)
        z = np.ascontiguousarray(zi, dtype=np.float64).copy()

        def p(arr):
            return arr.ctypes.data_as(
                ctypes.POINTER(ctypes.c_double))

        lib.atpu_iir(p(b), p(a), len(b), p(x), p(y), len(x), p(z))
        return (y, z)
    except ImportError:
        # direct form II transposed, scalar fallback
        b = np.asarray(b)
        a = np.asarray(a)
        n = len(b)
        z = list(zi)
        y = np.empty_like(x)
        for i in range(len(x)):
            xi = x[i]
            yi = b[0] * xi + z[0]
            for j in range(n - 2):
                z[j] = b[j + 1] * xi + z[j + 1] - a[j + 1] * yi
            z[n - 2] = b[n - 1] * xi - a[n - 1] * yi
            y[i] = yi
        return (y, np.array(z))


class ReplayGain:
    """performs ReplayGain calculation over PCMReaders

    >>> rg = ReplayGain(44100)
    >>> (gain, peak) = rg.title_gain(pcmreader)
    >>> (gain, peak) = rg.album_gain()
    """

    def __init__(self, sample_rate):
        if sample_rate not in YULE:
            raise ValueError("unsupported sample rate")
        self.sample_rate = sample_rate
        (self.yule_b, self.yule_a) = YULE[sample_rate]
        (self.butter_b, self.butter_a) = BUTTER[sample_rate]
        self.window_samples = int(np.ceil(sample_rate * RMS_WINDOW_TIME))

        bins = int(STEPS_PER_DB * MAX_DB)
        self.title_histogram = np.zeros(bins, dtype=np.int64)
        self.album_histogram = np.zeros(bins, dtype=np.int64)
        self.album_peak = 0.0
        self._reset_title()

    def _reset_title(self):
        self.title_peak = 0.0
        self._zi_yule = [np.zeros(MAX_ORDER), np.zeros(MAX_ORDER)]
        self._zi_butter = [np.zeros(2), np.zeros(2)]
        self._window_fill = 0
        self._window_sum = 0.0
        self._pending = np.zeros(0)
        self._device_channels = None   # ATPU_RG_BACKEND=jax buffers

    def title_gain(self, pcmreader):
        """processes a full PCMReader, returning (gain_dB, peak)

        the reader's contents accumulate into the album statistics"""
        if pcmreader.sample_rate != self.sample_rate:
            raise ValueError("pcmreader's sample rate doesn't match")
        if pcmreader.channels > 2:
            raise ValueError("channel count must be 1 or 2")

        frame = pcmreader.read(4096)
        while len(frame) > 0:
            self.analyze_framelist(frame)
            frame = pcmreader.read(4096)
        self._flush_device_title()

        gain = _analyze_histogram(self.title_histogram)
        peak = self.title_peak
        self.album_histogram += self.title_histogram
        self.title_histogram[:] = 0
        self._reset_title()
        return (gain, peak)

    def analyze_framelist(self, framelist):
        """accumulates one FrameList into the title statistics"""
        samples = framelist.samples.astype(np.float64)
        bps = framelist.bits_per_sample
        peak_shift = 1 << (bps - 1)

        peak = float(np.max(np.abs(samples))) / peak_shift \
            if samples.size else 0.0
        self.title_peak = max(self.title_peak, peak)
        self.album_peak = max(self.album_peak, peak)

        # scale to 16-bit range as the reference does
        if bps == 8:
            scaled = samples * 256.0
        elif bps == 16:
            scaled = samples
        else:
            # the reference uses an arithmetic shift (replaygain.c:267)
            scaled = np.floor(samples / float(1 << (bps - 16)))

        if framelist.channels == 1:
            channels = [scaled[:, 0], scaled[:, 0]]
        else:
            channels = [scaled[:, 0], scaled[:, 1]]

        from .ops import converters as _conv
        if _conv.rg_backend() == "jax":
            # device path: buffer the scaled channels; the title flush
            # runs the whole equal-loudness cascade as one batched FIR
            # conv + windowed-sum program (ops/converters.py).  Peaks
            # stay host-side (computed above, original bps domain).
            if self._device_channels is None:
                self._device_channels = ([], [])
            self._device_channels[0].append(channels[0])
            self._device_channels[1].append(channels[1])
            return

        squared = np.zeros(len(channels[0]))
        for (c, x) in enumerate(channels):
            (stepped, self._zi_yule[c]) = _lfilter(
                self.yule_b, self.yule_a, x, self._zi_yule[c])
            (out, self._zi_butter[c]) = _lfilter(
                self.butter_b, self.butter_a, stepped,
                self._zi_butter[c])
            squared += out * out

        # accumulate 50ms RMS windows into the histogram
        pos = 0
        n = len(squared)
        while pos < n:
            take = min(self.window_samples - self._window_fill, n - pos)
            self._window_sum += float(squared[pos:pos + take].sum())
            self._window_fill += take
            pos += take
            if self._window_fill == self.window_samples:
                value = (STEPS_PER_DB * 10.0 *
                         np.log10(self._window_sum /
                                  self._window_fill * 0.5 + 1e-37))
                ival = int(value)
                ival = max(0, min(ival,
                                  len(self.title_histogram) - 1))
                self.title_histogram[ival] += 1
                self._window_sum = 0.0
                self._window_fill = 0

    def _flush_device_title(self):
        """runs the buffered device analysis for one title
        (no-op on the host path)"""
        if self._device_channels is None:
            return
        from .ops import converters as _conv
        (ls, rs) = self._device_channels
        self._device_channels = None
        left = np.concatenate(ls) if ls else np.zeros(0)
        right = np.concatenate(rs) if rs else np.zeros(0)
        sums = _conv.rg_window_sums(left, right, self.sample_rate,
                                    self.window_samples)
        if len(sums) == 0:
            return
        values = (STEPS_PER_DB * 10.0 *
                  np.log10(sums / self.window_samples * 0.5 + 1e-37))
        ivals = np.clip(values.astype(np.int64), 0,
                        len(self.title_histogram) - 1)
        np.add.at(self.title_histogram, ivals, 1)

    def album_gain(self):
        """returns (gain_dB, peak) for all titles processed so far"""
        return (_analyze_histogram(self.album_histogram),
                self.album_peak)


def _analyze_histogram(histogram):
    """the 95th-percentile loudness statistic (replaygain.c:754-772)"""
    elems = int(histogram.sum())
    if elems == 0:
        return 64.82   # GAIN_NOT_ENOUGH_SAMPLES fallback: PINK_REF - 0
    upper = int(np.ceil(elems * (1.0 - RMS_PERCENTILE)))
    i = len(histogram)
    while i > 0:
        i -= 1
        upper -= int(histogram[i])
        if upper <= 0:
            break
    return float(PINK_REF - i / STEPS_PER_DB)


class ReplayGainReader:
    """a PCMReader which applies ReplayGain to its output"""

    def __init__(self, pcmreader, replaygain, peak):
        """replaygain is in dB, peak is the maximum sample fraction"""
        self.pcmreader = pcmreader
        self.sample_rate = pcmreader.sample_rate
        self.channels = pcmreader.channels
        self.channel_mask = pcmreader.channel_mask
        self.bits_per_sample = pcmreader.bits_per_sample

        multiplier = 10.0 ** (replaygain / 20.0)
        if peak > 0 and (multiplier * peak) > 1.0:
            multiplier = 1.0 / peak
        self.multiplier = multiplier

    def read(self, pcm_frames):
        import os
        frame = self.pcmreader.read(pcm_frames)
        max_value = (1 << (self.bits_per_sample - 1)) - 1
        min_value = -(1 << (self.bits_per_sample - 1))
        scaled = np.rint(frame.samples.astype(np.float64) *
                         self.multiplier)
        clipped = np.clip(scaled, min_value, max_value).astype(np.int32)
        # 1-bit white dither, as the reference applies
        dither_bytes = np.frombuffer(os.urandom(clipped.size),
                                     dtype=np.uint8)
        dither = (dither_bytes & 1).astype(np.int32).reshape(
            clipped.shape)
        return pcm_mod.FrameList._wrap(clipped ^ dither,
                                       self.bits_per_sample)

    def close(self):
        self.pcmreader.close()


def calculate_replay_gain_values(tracks, progress=None):
    """yields (track, gain, peak, album_gain, album_peak) per track

    (reference __init__.py:2845 calculate_replay_gain)"""
    from .pcmstream import (PCMConverter, PCMReaderProgress,
                            resampled_frame_count)

    if len(tracks) == 0:
        return

    from bisect import bisect

    rates = sorted(SAMPLE_RATES)
    counts = {}
    for track in tracks:
        counts[track.sample_rate()] = \
            counts.get(track.sample_rate(), 0) + 1
    most_common = max(counts, key=lambda r: counts[r])
    target_rate = ([rates[0]] + rates)[bisect(rates, most_common)]

    total_frames = sum(resampled_frame_count(track.total_frames(),
                                             track.sample_rate(),
                                             target_rate)
                       for track in tracks)
    current_frames = 0

    rg = ReplayGain(target_rate)
    gains = []

    for track in tracks:
        reader = track.to_pcm()
        if reader.channels > 2:
            output_channels = 2
            output_mask = 0x3
        else:
            output_channels = reader.channels
            output_mask = reader.channel_mask

        if ((reader.channels != output_channels) or
                (reader.channel_mask != output_mask) or
                (reader.sample_rate != target_rate)):
            reader = PCMConverter(reader, target_rate,
                                  output_channels, output_mask,
                                  reader.bits_per_sample)

        if progress is not None:
            reader = PCMReaderProgress(reader, total_frames, progress,
                                       current_frames=current_frames)
        (gain, peak) = rg.title_gain(reader)
        reader.close()
        current_frames += track.total_frames()
        gains.append((track, gain, peak))

    (album_gain, album_peak) = rg.album_gain()
    for (track, gain, peak) in gains:
        yield (track, gain, peak, album_gain, album_peak)


def applicable_replay_gain(tracks):
    """returns True if ReplayGain can be applied to the AudioFiles
    (reference __init__.py:2823): all tracks must share one supported
    sample rate and a 1- or 2-channel layout"""
    sample_rates = {track.sample_rate() for track in tracks}
    if len(sample_rates) != 1 or sample_rates.pop() not in (
            48000, 44100, 32000, 24000, 22050, 16000, 12000, 11025,
            8000, 18900, 37800, 56000, 64000, 88200, 96000, 112000,
            128000, 144000, 176400, 192000):
        return False
    channels = {track.channels() for track in tracks}
    return len(channels) == 1 and channels.pop() in (1, 2)
