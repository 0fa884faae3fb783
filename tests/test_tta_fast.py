"""Differential tests: native TTA codec vs the scalar oracle."""

import io
import os

import numpy as np
import pytest

from audiotools_tpu import pcm, _native
from audiotools_tpu.pcmstream import PCMReader
from audiotools_tpu.ref import tta as oracle

SR = 44100


def signal(n, ch, bps, seed=4):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    lim = (1 << (bps - 1)) - 1
    scale = lim // 4
    cols = [scale * np.sin(2 * np.pi * (300 + 80 * c) * t / SR) +
            rng.normal(0, scale * 0.03, n) for c in range(ch)]
    return np.clip(np.stack(cols, axis=1), -lim - 1, lim).astype(
        np.int32)


@pytest.mark.parametrize("ch,bps", [(1, 16), (2, 16), (2, 24),
                                    (6, 16)])
def test_tta_encode_matches_oracle(ch, bps):
    bs = oracle.block_size_for(SR)
    n = bs * 2 + 777
    arr = signal(n, ch, bps)
    parts = []
    sizes = []
    pos = 0
    while pos < n:
        m = min(bs, n - pos)
        parts.append(oracle.encode_tta_frame(
            bps, ch, arr[pos:pos + m].astype(np.int64)))
        sizes.append(m)
        pos += m
    (fast, lens) = _native.tta_encode_frames(
        arr, np.asarray(sizes, dtype=np.int32), ch, bps)
    assert b"".join(parts) == fast

    # native decode round trip
    got = []
    off = 0
    for (m, length) in zip(sizes, lens):
        (s, _c) = _native.tta_decode_frame(fast[off:off + length],
                                           m, ch, bps)
        got.append(s)
        off += length
    assert np.array_equal(np.concatenate(got), arr)


def test_tta_format_roundtrip_and_seek(tmp_path):
    from audiotools_tpu.formats.tta import TrueAudio
    n = SR * 8 + 999
    arr = signal(n, 2, 16)
    fl = pcm.FrameList._wrap(arr, 16)
    reader = PCMReader(io.BytesIO(fl.to_bytes(False, True)),
                       SR, 2, 3, 16)
    path = str(tmp_path / "t.tta")
    af = TrueAudio.from_pcm(path, reader)
    assert af.seekable()
    assert af.verify()

    dec = af.to_pcm()
    out = []
    x = dec.read(65536)
    while x.frames:
        out.append(x.samples)
        x = dec.read(65536)
    dec.close()
    assert np.array_equal(np.concatenate(out), arr)

    # seek lands on a frame boundary at or before the target
    dec = af.to_pcm()
    target = SR * 5 + 17
    pos = dec.seek(target)
    assert pos <= target
    first = dec.read(4096).samples     # may exceed the request
    dec.close()
    assert np.array_equal(first, arr[pos:pos + first.shape[0]])


def test_tta_fast_equals_oracle_file(tmp_path):
    from audiotools_tpu.formats.tta import TrueAudio
    n = SR * 3
    arr = signal(n, 2, 16)

    def mkreader():
        fl = pcm.FrameList._wrap(arr, 16)
        return PCMReader(io.BytesIO(fl.to_bytes(False, True)),
                         SR, 2, 3, 16)

    fast_path = str(tmp_path / "fast.tta")
    TrueAudio.from_pcm(fast_path, mkreader())
    os.environ["ATPU_TTA_ORACLE"] = "1"
    try:
        oracle_path = str(tmp_path / "oracle.tta")
        TrueAudio.from_pcm(oracle_path, mkreader())
    finally:
        del os.environ["ATPU_TTA_ORACLE"]
    assert open(fast_path, "rb").read() == \
        open(oracle_path, "rb").read()


def test_shn_fast_matches_oracle():
    """native Shorten encode == oracle, and decodes losslessly"""
    from audiotools_tpu.ref.shn import encode_shn as oracle_shn
    n = 256 * 9 + 123
    for (ch, bps, signed_s, be) in [(2, 16, True, False),
                                    (1, 16, True, False),
                                    (2, 8, False, False)]:
        arr = signal(n, ch, bps, seed=8)
        header = b"RIFFfakeheader" * 2

        def mkreader():
            fl = pcm.FrameList._wrap(arr, bps)
            return PCMReader(
                io.BytesIO(fl.to_bytes(False, True)),
                SR, ch, 3 if ch == 2 else 4, bps)

        b1 = io.BytesIO()
        oracle_shn(b1, mkreader(), be, signed_s, header, b"", 256)
        fast = _native.shn_encode(arr, bps, signed_s, be, header,
                                  b"", 256)
        assert b1.getvalue() == fast, (ch, bps)
        (dec, _ft, _bps) = _native.shn_decode(fast, n + 1024, ch)
        assert np.array_equal(dec, arr), (ch, bps)


# the full-frame scan (46k steps) costs a fresh XLA compile per
# (ch, bps) shape on this 1-core box; default run keeps two combos
@pytest.mark.parametrize("ch,bps", [
    (1, 8), (2, 16),
    pytest.param(2, 24, marks=pytest.mark.slow),
    pytest.param(6, 16, marks=pytest.mark.slow)])
def test_tta_jax_backend_matches_native(monkeypatch, ch, bps):
    """ATPU_TTA_BACKEND=jax (device decorrelation + fixed predictor +
    hybrid filter scans, ops/tta_scan.py; host adaptive-Rice pack) is
    byte-identical to the fused native encoder"""
    from audiotools_tpu.codecs import tta as tta_codec
    n = 60000    # > one TTA frame, with a short final frame
    arr = signal(n, ch, bps, seed=13)

    def mkreader():
        fl = pcm.FrameList._wrap(arr, bps)
        mask = {1: 0x4, 2: 0x3, 6: 0x3F}[ch]
        return PCMReader(io.BytesIO(fl.to_bytes(False, bps > 8)),
                         SR, ch, mask, bps)

    outs = {}
    for backend in ("native", "jax"):
        monkeypatch.setenv("ATPU_TTA_BACKEND", backend)
        buf = io.BytesIO()
        sizes = tta_codec.encode_tta(buf, mkreader())
        outs[backend] = buf.getvalue()
        assert sum(sizes) == len(outs[backend])
    assert outs["native"] == outs["jax"]


def test_tta_scan_ops_jax_matches_numpy():
    """the analysis program itself is backend-deterministic"""
    jnp = pytest.importorskip("jax.numpy")
    import jax
    jax.config.update("jax_enable_x64", True)
    from audiotools_tpu.ops import tta_scan
    rng = np.random.default_rng(5)
    samples = rng.integers(-(1 << 23), 1 << 23,
                           (2, 700, 2)).astype(np.int32)
    a = tta_scan.analyze_frames(np, samples, 24)
    b = np.asarray(tta_scan.analyze_frames(jnp, jnp.asarray(samples),
                                           24))
    assert (a == b).all()
