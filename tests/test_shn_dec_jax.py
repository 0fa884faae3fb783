"""SHN device decode path (ATPU_SHN_DEC_BACKEND=jax): host entropy
scan + cumsum synthesis must be byte-identical to the host decoder.

Role of reference test_formats.py's Shorten round-trips, applied to
the decode backend split (reference src/decoders/shn.c:1142)."""

import io
import os

import numpy as np
import pytest

from audiotools_tpu import _native, pcm
from audiotools_tpu.codecs import shn as cshn
from audiotools_tpu.pcmstream import PCMReader


def _encode(arr, bps, signed=True, block_size=256):
    nch = arr.shape[1]
    buf = io.BytesIO()
    cshn.encode_shn(
        buf,
        PCMReader(io.BytesIO(pcm.FrameList._wrap(arr, bps)
                             .to_bytes(False, bps > 8)),
                  44100, nch, 0, bps),
        False, signed, b"H" * 44, b"", block_size=block_size)
    return buf.getvalue()


def _signal(nch, bps, nframes, seed):
    rng = np.random.default_rng(seed)
    arr = (rng.integers(-2 ** (bps - 1), 2 ** (bps - 1),
                        (nframes, nch)) // 3).astype(np.int32)
    arr = np.cumsum(arr // 64, axis=0)
    return np.clip(arr, -2 ** (bps - 1),
                   2 ** (bps - 1) - 1).astype(np.int32)


@pytest.mark.parametrize("nch,bps,nframes", [
    (1, 16, 5000),
    (2, 16, 10000),
    (2, 8, 3000),
    (3, 16, 777),       # partial final block
    (2, 16, 5),         # shorter than the predictor history
])
def test_device_decode_matches_host(nch, bps, nframes):
    arr = _signal(nch, bps, nframes, seed=nframes)
    data = _encode(arr, bps)
    (host, _ft, _bps) = _native.shn_decode(
        data, nframes + 1024, nch)
    dev = cshn._decode_jax(data)
    assert dev is not None
    assert np.array_equal(host, dev)


def test_device_decoder_reader_path():
    """FastSHNDecoder.read with the jax backend env set"""
    arr = _signal(2, 16, 4096, seed=9)
    data = _encode(arr, 16)
    os.environ["ATPU_SHN_DEC_BACKEND"] = "jax"
    try:
        dec = cshn.decoder_for_file(io.BytesIO(data))
        out = []
        fl = dec.read(4096)
        while len(fl):
            out.append(fl.samples)
            fl = dec.read(4096)
        got = np.concatenate(out)
    finally:
        del os.environ["ATPU_SHN_DEC_BACKEND"]
    assert np.array_equal(got, arr)


def test_scan_refuses_qlpc_streams():
    """streams with FN_QLPC fall back to the host decoder"""
    from audiotools_tpu.bitstream import BitstreamWriter

    out = io.BytesIO()
    w = BitstreamWriter(out, False)

    def unsigned(c, v):
        w.unary(1, v >> c)
        w.write(c, v & ((1 << c) - 1))

    def long_(v):
        unsigned(2, 2)          # length-of-length
        unsigned(2, v)

    w.write_bytes(b"ajkg")
    w.write(8, 2)
    long_(2)                    # file_type: unsigned 8-bit
    long_(1)                    # channels
    long_(3)                    # block size (tiny)
    long_(3)                    # max LPC
    long_(0)                    # means
    long_(0)                    # bytes to skip
    unsigned(2, 7)              # FN_QLPC
    unsigned(3, 0)              # energy
    unsigned(2, 0)              # lpc_count 0
    for _ in range(3):          # 3 residuals at energy 0
        unsigned(1, 0)
    unsigned(2, 4)              # FN_QUIT
    w.byte_align()
    w.flush()
    data = out.getvalue()

    with pytest.raises(_native.ShnDeviceUnsupported):
        _native.shn_scan(data)
    assert cshn._decode_jax(data) is None
