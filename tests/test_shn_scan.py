"""SHN device analysis (ops/shn_scan.py) vs the all-host C++ path.

The device backend (ATPU_SHN_BACKEND=jax) computes the per-(block,
channel) zero/wasted/diff/energy decisions on device and steers the
C++ emitter; streams must be byte-identical to the all-host encoder
(and to the scalar oracle) across the signal matrix.
"""

import io

import numpy as np
import pytest

from audiotools_tpu import pcm
from audiotools_tpu.pcmstream import PCMReader
from audiotools_tpu.codecs import shn as shn_codec
from audiotools_tpu.ref import shn as shn_oracle


def _reader(arr, bps=16, rate=44100):
    fl = pcm.FrameList._wrap(arr.astype(np.int32), bps)
    ch = arr.shape[1]
    mask = {1: 0x4, 2: 0x3}[ch]
    return PCMReader(io.BytesIO(fl.to_bytes(False, True)),
                     rate, ch, mask, bps)


def _signals():
    rng = np.random.default_rng(21)
    t = np.arange(44100)
    tone = np.clip(
        9000 * np.sin(2 * np.pi * 441 * t / 44100), -32768,
        32767).astype(np.int32)
    noise = rng.integers(-2000, 2000, 44100).astype(np.int32)
    wasted = (rng.integers(-800, 800, 44100) << 3).astype(np.int32)
    zeros = np.zeros(44100, dtype=np.int32)
    mixed = np.concatenate([zeros[:5000], tone[:20000],
                            noise[:19100]])
    return {
        "tone": np.stack([tone, (tone * 2) // 3], axis=1),
        "noise": np.stack([noise, -noise], axis=1),
        "wasted": np.stack([wasted, wasted >> 1], axis=1),
        "mixed": np.stack([mixed, mixed[::-1]], axis=1),
        "mono": tone[:30011][:, None],
        "short": noise[:97][:, None],
    }


def _encode(arr, backend, bps=16, signed=True, block_size=256,
            monkeypatch=None):
    buf = io.BytesIO()
    if monkeypatch is not None:
        monkeypatch.setenv("ATPU_SHN_BACKEND", backend)
    shn_codec.encode_shn(buf, _reader(arr, bps), False, signed,
                         b"RIFFhdr!", b"tail", block_size)
    return buf.getvalue()


@pytest.mark.parametrize("name", ["tone", "noise", "wasted", "mixed",
                                  "mono", "short"])
def test_jax_steered_stream_byte_identical(name, monkeypatch):
    arr = _signals()[name]
    host = _encode(arr, "native", monkeypatch=monkeypatch)
    dev = _encode(arr, "jax", monkeypatch=monkeypatch)
    assert dev == host


@pytest.mark.parametrize("kwargs", [
    dict(bps=8, signed=False),
    dict(bps=16, signed=False),
    dict(block_size=777),
])
def test_jax_steered_variants(kwargs, monkeypatch):
    arr = _signals()["mixed"]
    if kwargs.get("bps") == 8:
        arr = arr >> 8
    host = _encode(arr, "native", monkeypatch=monkeypatch, **kwargs)
    dev = _encode(arr, "jax", monkeypatch=monkeypatch, **kwargs)
    assert dev == host


def test_jax_stream_decodes_roundtrip(monkeypatch):
    arr = _signals()["mixed"]
    data = _encode(arr, "jax", monkeypatch=monkeypatch)
    dec = shn_oracle.SHNDecoder(io.BytesIO(data))
    out = []
    frame = dec.read(4096)
    while frame.frames:
        out.append(np.array(frame.samples))
        frame = dec.read(4096)
    assert np.array_equal(np.concatenate(out), arr)


def test_numpy_jax_analysis_identical():
    """the analysis kernel itself is backend-deterministic"""
    import jax.numpy as jnp
    from audiotools_tpu.ops import shn_scan

    rng = np.random.default_rng(5)
    blocks = rng.integers(-30000, 30000,
                          (16, 256, 2)).astype(np.int32)
    blocks[3] = 0                        # FN_ZERO block
    blocks[4] <<= 4                      # wasted bits
    host = shn_scan.analyze_blocks(np, blocks, 1 << 15)
    dev = np.asarray(shn_scan.analyze_blocks(jnp, blocks, 1 << 15))
    assert np.array_equal(host, dev)
