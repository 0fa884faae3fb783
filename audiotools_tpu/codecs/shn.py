"""Production Shorten codec entry points: C++ kernels behind the
oracle-compatible API (``ATPU_SHN_ORACLE=1`` falls back)."""

from __future__ import annotations

import os

import numpy as np

from .. import _native, pcm
from ..ref import shn as oracle


def _use_oracle():
    return os.environ.get("ATPU_SHN_ORACLE", "0") == "1"


def _backend():
    """"jax" = device diff/energy analysis (ops/shn_scan.py) steering
    the C++ emitter; "native" = all-host C++"""
    return os.environ.get("ATPU_SHN_BACKEND", "native")


def _dec_backend():
    """"jax" = host entropy scan + device cumsum synthesis
    (ops/shn_synth.py); "native" (default) = all-host C++"""
    return os.environ.get("ATPU_SHN_DEC_BACKEND", "native")


_jit_cache = {}


def _analyze_jax(blocks, sign_adjustment):
    """jitted batched SHN decision analysis; cached per shape"""
    import jax
    jax.config.update("jax_enable_x64", True)
    key = (blocks.shape, sign_adjustment)
    if key not in _jit_cache:
        import jax.numpy as jnp
        from ..ops import shn_scan
        _jit_cache[key] = jax.jit(
            lambda b: shn_scan.analyze_blocks(jnp, b,
                                              sign_adjustment))
    return np.asarray(jax.device_get(_jit_cache[key](blocks)))


def _device_decisions(samples, bps, signed_samples, block_size):
    """computes the full decision array for a stream on device

    full blocks batch through the jitted analysis (padded up to a
    power-of-two block count); the final partial block, whose length
    is a different static shape, runs the same analysis in numpy with
    the preceding block's shifted tail as warm-up"""
    from ..ops import shn_scan

    (n, ch) = samples.shape
    sign_adjustment = 0
    if not signed_samples:
        sign_adjustment = 1 << (bps - 1)
    nblocks = -(-n // block_size)
    nfull = n // block_size
    full = samples[:nfull * block_size].reshape(
        nfull, block_size, ch).astype(np.int32)
    out = np.zeros((nblocks, ch, 4), dtype=np.int32)
    if nfull:
        pad = 1
        while pad < nfull:
            pad <<= 1
        padded = (np.concatenate(
            [full, np.zeros((pad - nfull,) + full.shape[1:],
                            dtype=np.int32)]) if pad != nfull
            else full)
        out[:nfull] = _analyze_jax(padded, sign_adjustment)[:nfull]
    if nblocks != nfull:
        tail = samples[nfull * block_size:].astype(np.int32)
        if nfull:
            last = full[-1] + sign_adjustment          # [m, ch]
            wasted = out[nfull - 1, :, 1]
            shifted = last >> wasted[None, :]
            prev3 = shifted[-3:]
            if prev3.shape[0] < 3:
                prev3 = np.concatenate(
                    [np.zeros((3 - prev3.shape[0], ch),
                              dtype=np.int32), prev3])
        else:
            prev3 = np.zeros((3, ch), dtype=np.int32)
        out[nfull] = shn_scan.analyze_blocks(
            np, tail[None], sign_adjustment, prev3_in=prev3)[0]
    return out


def encode_shn(file_or_path, pcmreader, is_big_endian,
               signed_samples, header_data, footer_data=b"",
               block_size=256):
    """encodes a Shorten file from a PCMReader (oracle-compatible)"""
    if _use_oracle():
        return oracle.encode_shn(file_or_path, pcmreader,
                                 is_big_endian, signed_samples,
                                 header_data, footer_data, block_size)
    from ..pcmstream import BufferedPCMReader

    reader = BufferedPCMReader(pcmreader)
    chunks = []
    framelist = reader.read(65536)
    while len(framelist) > 0:
        chunks.append(framelist.samples)
        framelist = reader.read(65536)
    samples = (np.concatenate(chunks) if chunks else
               np.zeros((0, pcmreader.channels), dtype=np.int32))
    decisions = None
    if _backend() == "jax" and samples.shape[0]:
        decisions = _device_decisions(
            samples, pcmreader.bits_per_sample, signed_samples,
            block_size)
    data = _native.shn_encode(samples, pcmreader.bits_per_sample,
                              signed_samples, is_big_endian,
                              header_data, footer_data, block_size,
                              decisions=decisions)
    if isinstance(file_or_path, str):
        with open(file_or_path, "wb") as f:
            f.write(data)
    else:
        file_or_path.write(data)


_dec_jit_cache = {}


def _decode_jax(data):
    """decodes a whole SHN stream via the device path: host
    entropy scan (_native.shn_scan) + cumsum synthesis on device
    (ops/shn_synth.py); returns int32 [frames, ch], or None when the
    stream uses features outside device coverage (QLPC,
    DIFF0-with-means) and the host decoder must run"""
    from ..ops import shn_synth

    try:
        (res, row_meta, info) = _native.shn_scan(data)
    except _native.ShnDeviceUnsupported:
        return None
    channels = info["channels"]
    total = info["total_frames"]
    R = res.shape[0]
    if R == 0:
        return np.zeros((0, channels), dtype=np.int32)
    warm = shn_synth.warmup_chain(res, row_meta, channels)

    R_pad = 1
    while R_pad < R:
        R_pad <<= 1
    n = res.shape[1]
    res_p = np.zeros((R_pad, n), dtype=np.int32)
    res_p[:R] = res
    cmd_p = np.full(R_pad, shn_synth.CMD_ZERO, dtype=np.int32)
    cmd_p[:R] = row_meta[:, 0]
    warm_p = np.zeros((R_pad, 3), dtype=np.int64)
    warm_p[:R] = warm
    shift_p = np.zeros(R_pad, dtype=np.int32)
    shift_p[:R] = row_meta[:, 2]

    import jax
    jax.config.update("jax_enable_x64", True)
    key = (R_pad, n, info["sign_adjustment"])
    if key not in _dec_jit_cache:
        import jax.numpy as jnp
        sa = info["sign_adjustment"]
        _dec_jit_cache[key] = jax.jit(
            lambda r, c, w, s: shn_synth.synthesize(
                jnp, r, c, w, s, sa))
    planes = np.asarray(
        _dec_jit_cache[key](res_p, cmd_p, warm_p, shift_p))

    # rows -> interleaved [frames, ch] (native decoder semantics:
    # only complete channel sets count toward the frame total)
    out = np.zeros((total, channels), dtype=np.int32)
    pos = np.zeros(channels, dtype=np.int64)
    for row in range(R):
        n_b = int(row_meta[row, 1])
        chan = int(row_meta[row, 3])
        take = min(n_b, total - int(pos[chan]))
        if take > 0:
            out[pos[chan]:pos[chan] + take, chan] = \
                planes[row, :take]
        pos[chan] += n_b
    return out


class FastSHNDecoder(oracle.SHNDecoder):
    """SHNDecoder decoding the whole stream via the native kernel

    metadata/header parsing (pcm_split, wave/aiff recovery) stays in
    the Python base class; bulk sample decode runs in C++."""

    def __init__(self, file_or_path):
        oracle.SHNDecoder.__init__(self, file_or_path)
        self.__decoded__ = None
        self.__offset__ = 0
        self.__path__ = file_or_path

    def read(self, pcm_frames):
        if self.__decoded__ is None:
            if isinstance(self.__path__, str):
                with open(self.__path__, "rb") as f:
                    data = f.read()
            else:
                pos = self.__path__.tell()
                self.__path__.seek(0, 0)
                data = self.__path__.read()
                self.__path__.seek(pos, 0)
            samples = None
            if _dec_backend() == "jax":
                samples = _decode_jax(data)     # None: host fallback
            if samples is None:
                # residuals cost >= ~2 bits each, so the frame count
                # is bounded by the stream size
                max_frames = ((len(data) * 4) // self.channels) + 1024
                (samples, _ftype, _bps) = _native.shn_decode(
                    data, max_frames, self.channels)
            if not self.signed_samples:
                samples = samples  # kernel already sign-adjusts
            self.__decoded__ = samples
        want = max(pcm_frames, 1)
        chunk = self.__decoded__[self.__offset__:
                                 self.__offset__ + want]
        self.__offset__ += chunk.shape[0]
        return pcm.FrameList._wrap(
            np.ascontiguousarray(chunk.astype(np.int32)),
            self.bits_per_sample)

    def seek(self, pcm_frame):
        """seeks within the fully-decoded stream"""
        if self.__decoded__ is None:
            self.read(0)
        self.__offset__ = max(
            min(int(pcm_frame), self.__decoded__.shape[0]), 0)
        return self.__offset__


def decoder_for_file(file_or_path):
    """returns a PCMReader decoding the given Shorten file"""
    if _use_oracle():
        return oracle.SHNDecoder(file_or_path)
    return FastSHNDecoder(file_or_path)
