"""AccurateRip track checksums (V1 and V2).

Rebuild of the reference _accuraterip module
(``/root/reference/src/accuraterip.c:44-326``): offset-windowed
multiply-accumulate CRCs over CD-format PCM, vectorized with NumPy —
the per-sample multiply-accumulate becomes a weighted dot product,
which is the same shape the device kernels use for batched verification
of whole albums.
"""

from __future__ import annotations

import numpy as np


class _ChecksumBase:
    """shared window logic: the first track skips the first 5 CD
    frames' worth of samples; the last track stops 5 CD frames early"""

    def __init__(self, is_first, is_last, sample_rate,
                 total_pcm_frames):
        if sample_rate <= 0:
            raise ValueError("sample rate must be > 0")
        if total_pcm_frames <= 0:
            raise ValueError("total PCM frames must be > 0")
        self.track_index = 1
        self.checksum_value = 0
        if is_first:
            self.start_offset = (sample_rate // 75) * 5
        else:
            self.start_offset = 0
        if is_last:
            self.end_offset = total_pcm_frames - (sample_rate // 75) * 5
        else:
            self.end_offset = total_pcm_frames

    def _values_and_indices(self, framelist):
        if framelist.channels != 2:
            raise ValueError("FrameList must be 2 channels")
        if framelist.bits_per_sample != 16:
            raise ValueError("FrameList must be 16 bits per sample")
        samples = framelist.samples.astype(np.int64)
        left_u = np.where(samples[:, 0] >= 0, samples[:, 0],
                          (1 << 16) + samples[:, 0])
        right_u = np.where(samples[:, 1] >= 0, samples[:, 1],
                           (1 << 16) + samples[:, 1])
        values = (right_u << 16) | left_u
        indices = np.arange(self.track_index,
                            self.track_index + framelist.frames,
                            dtype=np.int64)
        self.track_index += framelist.frames
        mask = ((indices >= self.start_offset) &
                (indices <= self.end_offset))
        return (values[mask], indices[mask])

    def checksum(self):
        """returns the current checksum as a 32-bit unsigned int"""
        return self.checksum_value & 0xFFFFFFFF


class ChecksumV1(_ChecksumBase):
    """the AccurateRip version-1 checksum"""

    def update(self, framelist):
        """processes a 2-channel, 16-bit FrameList"""
        (values, indices) = self._values_and_indices(framelist)
        products = (values * indices) & 0xFFFFFFFF
        self.checksum_value = (self.checksum_value +
                               int(products.sum())) & 0xFFFFFFFF


class ChecksumV2(_ChecksumBase):
    """the AccurateRip version-2 checksum (adds the high-order bits)"""

    def update(self, framelist):
        (values, indices) = self._values_and_indices(framelist)
        products = values * indices          # exact in int64
        low = products & 0xFFFFFFFF
        high = products >> 32
        self.checksum_value = (self.checksum_value +
                               int(low.sum()) +
                               int(high.sum())) & 0xFFFFFFFF


class AccurateRipCRC(_ChecksumBase):
    """streaming V1+V2 in one pass via the native MAC kernel

    feed int32 [n, 2] sample arrays directly (no FrameList wrap);
    byte-identical to ChecksumV1/ChecksumV2 (the NumPy oracles above,
    kept for cross-checking)."""

    def __init__(self, is_first, is_last, sample_rate,
                 total_pcm_frames):
        super().__init__(is_first, is_last, sample_rate,
                         total_pcm_frames)
        self.v1 = 0
        self.v2 = 0

    def update_array(self, samples):
        """samples: int32 [n, 2] in 16-bit range"""
        from .ops import converters as _conv
        if _conv.ar_backend() == "jax":
            # device MACs (exact uint32 lattice arithmetic) —
            # bit-identical to the host kernel on every backend
            (self.v1, self.v2) = _conv.accuraterip_update_device(
                samples, self.track_index, self.start_offset,
                self.end_offset, self.v1, self.v2)
        else:
            from . import _native
            (self.v1, self.v2) = _native.accuraterip_update(
                samples, self.track_index, self.start_offset,
                self.end_offset, self.v1, self.v2)
        self.track_index += samples.shape[0]

    def checksums(self):
        return (self.v1 & 0xFFFFFFFF, self.v2 & 0xFFFFFFFF)


def accuraterip_checksums(pcmreader, total_pcm_frames,
                          is_first=False, is_last=False,
                          sample_rate=44100):
    """computes (v1, v2) checksums over an entire PCMReader"""
    crc = AccurateRipCRC(is_first, is_last, sample_rate,
                         total_pcm_frames)
    frame = pcmreader.read(1 << 16)
    while len(frame) > 0:
        if frame.channels != 2:
            raise ValueError("FrameList must be 2 channels")
        if frame.bits_per_sample != 16:
            raise ValueError("FrameList must be 16 bits per sample")
        crc.update_array(frame.samples)
        frame = pcmreader.read(1 << 16)
    return crc.checksums()
