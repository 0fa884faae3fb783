"""Production TTA codec entry points: C++ frame kernels behind the
oracle-compatible API.

TTA's hybrid filter, fixed predictor and two-level adaptive Rice coder
are per-sample recurrences with 32-bit wraparound (host work; see
``_native/hostkernels.cpp``), byte-identical to the scalar oracle
``ref/tta.py``.  ``ATPU_TTA_ORACLE=1`` falls back to the oracle.
"""

from __future__ import annotations

import os

import numpy as np

from .. import _native, pcm
from ..ref import tta as oracle


def _use_oracle():
    return os.environ.get("ATPU_TTA_ORACLE", "0") == "1"


def _backend():
    """native (default) or jax: device decorrelation + fixed predictor
    + hybrid filter scans (ops/tta_scan.py), host Rice pack"""
    return os.environ.get("ATPU_TTA_BACKEND", "native")


_jax_tta_cache = {}


def _analyze_jax(samples_padded, bps):
    """runs the TTA analysis program on device, one jit per shape"""
    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from ..ops import tta_scan

    key = (samples_padded.shape, bps)
    if key not in _jax_tta_cache:
        _jax_tta_cache[key] = jax.jit(
            lambda s: tta_scan.analyze_frames(jnp, s, bps))
    return np.asarray(_jax_tta_cache[key](samples_padded))


def _encode_batch(samples, sizes, channels, bps, block_size):
    """encodes whole TTA frames; device or fused-host per backend"""
    if _backend() == "jax":
        # static shapes: frames pad to block_size (the filter is
        # causal, so a short final frame's residuals are a prefix of
        # its zero-padded lane) and the batch to a power of two
        F = len(sizes)
        F_pad = 1
        while F_pad < F:
            F_pad <<= 1
        batch = np.zeros((F_pad, block_size, channels), dtype=np.int32)
        pos = 0
        for (f, sz) in enumerate(sizes):
            batch[f, :sz] = samples[pos:pos + sz]
            pos += sz
        res = _analyze_jax(batch, bps)
        flat = np.concatenate(
            [res[f, :sizes[f]] for f in range(F)], axis=0)
        return _native.tta_pack_frames(
            np.ascontiguousarray(flat),
            np.asarray(sizes, dtype=np.int32), channels)
    return _native.tta_encode_frames(
        samples, np.asarray(sizes, dtype=np.int32), channels, bps)


def encode_tta(file, pcmreader):
    """writes TTA frames from a PCMReader to a file object

    returns a list of frame lengths in bytes (oracle-compatible)"""
    if _use_oracle():
        return oracle.encode_tta(file, pcmreader)

    block_size = oracle.block_size_for(pcmreader.sample_rate)
    bps = pcmreader.bits_per_sample
    channels = pcmreader.channels

    framelist = pcmreader.read(block_size * 16)
    pending = None
    all_sizes = []
    while len(framelist) > 0:
        samples = framelist.samples
        if pending is not None:
            samples = np.concatenate([pending, samples])
            pending = None
        n_full = samples.shape[0] // block_size
        tail = samples[n_full * block_size:]
        if n_full:
            sizes = np.full(n_full, block_size, dtype=np.int32)
            (data, lens) = _encode_batch(
                samples[:n_full * block_size], sizes, channels,
                bps, block_size)
            file.write(data)
            all_sizes.extend(int(v) for v in lens)
        if tail.shape[0]:
            pending = tail
        framelist = pcmreader.read(block_size * 16)
    if pending is not None and pending.shape[0]:
        (data, lens) = _encode_batch(
            pending, np.asarray([pending.shape[0]], dtype=np.int32),
            channels, bps, block_size)
        file.write(data)
        all_sizes.extend(int(v) for v in lens)
    return all_sizes


class FastTTADecoder(oracle.TTADecoder):
    """TTADecoder with the native per-frame kernel"""

    def decode_frame(self, n):
        """decodes one TTA frame of n PCM frames via the C++ kernel"""
        if _use_oracle():
            return oracle.TTADecoder.decode_frame(self, n)
        frame_index = self.total_tta_frames - oracle.div_ceil(
            self.remaining, self.block_size)
        # read this frame's bytes using the seektable lengths
        length = self.frame_lengths[frame_index]
        data = self.reader.read_bytes(length)
        (samples, _consumed) = _native.tta_decode_frame(
            data, n, self.channels, self.bits_per_sample)
        return samples.astype(np.int64)

    def seekable(self):
        return True

    def seek(self, pcm_frame):
        """seeks to the nearest prior TTA frame boundary using the
        stream's seektable (role of reference src/decoders/tta.c)"""
        target = max(min(int(pcm_frame), self.total_pcm_frames), 0)
        index = min(target // self.block_size,
                    self.total_tta_frames - 1) \
            if self.total_tta_frames else 0
        offset = self.__frames_start__ + sum(
            self.frame_lengths[:index])
        self.reader.source.seek(offset)
        self.reader.byte_align()
        position = index * self.block_size
        self.remaining = self.total_pcm_frames - position
        return position


def _dec_backend():
    """"jax" = host adaptive-Rice unpack + device filter inversion
    (ops/tta_synth.py); "native" (default) = all-host C++"""
    return os.environ.get("ATPU_TTA_DEC_BACKEND", "native")


_dec_jit_cache = {}

# TTA frames per device decode batch: frames are independent lanes
# (filter state resets per frame, reference src/decoders/tta.c:849),
# so the decoder windows the stream in fixed groups — bounded memory
# for arbitrarily long files (~12 MB of residual planes at 44.1 kHz
# stereo) and ONE jit signature per (n, ch, bps)
DEC_GROUP_FRAMES = 32


class JaxTTADecoder(FastTTADecoder):
    """TTADecoder on the device decode path: a group of frames
    entropy-unpacks on host in one pass (_native.tta_scan_residuals),
    then one jitted program inverts the hybrid filter + fixed
    predictor as a fused scan and undoes decorrelation
    (ops/tta_synth.py); decode_frame serves from the cached group
    (random access via the seektable's frame lengths)."""

    def _decode_group(self, g0):
        """decodes TTA frames [g0, g0 + DEC_GROUP_FRAMES) and caches
        their PCM"""
        from ..ops import tta_synth

        lens = np.asarray(self.frame_lengths, dtype=np.int64)
        F = self.total_tta_frames
        g1 = min(g0 + DEC_GROUP_FRAMES, F)
        offset = self.__frames_start__ + int(lens[:g0].sum())
        self.reader.source.seek(offset)
        self.reader.byte_align()
        data = self.reader.source.read(int(lens[g0:g1].sum()))
        n = self.block_size
        ch = self.channels
        sizes = np.full(g1 - g0, n, dtype=np.int32)
        if g1 == F:
            sizes[-1] = self.total_pcm_frames - (F - 1) * n
        res = _native.tta_scan_residuals(
            data, lens[g0:g1], sizes, ch)

        planes = np.zeros((DEC_GROUP_FRAMES, n, ch), dtype=np.int32)
        pos = 0
        for i in range(g1 - g0):
            planes[i, :sizes[i]] = res[pos:pos + sizes[i]]
            pos += sizes[i]

        import jax
        key = (n, ch, self.bits_per_sample)
        if key not in _dec_jit_cache:
            import jax.numpy as jnp
            bps = self.bits_per_sample
            _dec_jit_cache[key] = jax.jit(
                lambda r: tta_synth.synthesize(jnp, r, bps))
        out = np.asarray(_dec_jit_cache[key](planes))
        pieces = [out[i, :sizes[i]] for i in range(g1 - g0)]
        self.__group_base__ = g0
        self.__group_pcm__ = np.concatenate(pieces, axis=0)

    def decode_frame(self, n):
        frame_index = self.total_tta_frames - oracle.div_ceil(
            self.remaining, self.block_size)
        g0 = (frame_index // DEC_GROUP_FRAMES) * DEC_GROUP_FRAMES
        if getattr(self, "__group_base__", None) != g0:
            self._decode_group(g0)
        start = (frame_index - g0) * self.block_size
        return self.__group_pcm__[start:start + n].astype(np.int64)


def decoder_for_file(file):
    """returns a PCMReader decoding the given TTA stream"""
    if _use_oracle():
        return oracle.TTADecoder(file)
    cls = JaxTTADecoder if _dec_backend() == "jax" else FastTTADecoder
    dec = cls(file)
    dec.__frames_start__ = dec.reader.source.tell()
    return dec
