"""Differential tests: batched fast FLAC encoder vs the scalar oracle.

The numpy fast path must produce byte-identical files to the oracle
(shared deterministic numerics + identical decision logic).  The C++
decoder must invert everything the encoders produce.
"""

import io

import numpy as np
import pytest

from audiotools_tpu import pcm
from audiotools_tpu.pcmstream import PCMReader
from audiotools_tpu.ref.flac_enc import encode_flac as oracle_encode
from audiotools_tpu.ref.flac_dec import FlacDecoder
from audiotools_tpu.codecs.flac_enc_fast import encode_flac_fast


def make_reader(arr, sr=44100, bps=16):
    arr = np.asarray(arr, dtype=np.int32)
    if arr.ndim == 1:
        arr = arr.reshape(-1, 1)
    fl = pcm.FrameList._wrap(arr, bps)
    mask = {1: 4, 2: 3}.get(arr.shape[1], 0)
    return PCMReader(io.BytesIO(fl.to_bytes(False, True)),
                     sr, arr.shape[1], mask, bps)


def sine(n, freq, amp, phase=0.0):
    t = np.arange(n)
    return (amp * np.sin(2 * np.pi * freq * t / 44100 + phase)).astype(
        np.int32)


SIGNALS = {}


def get_signal(name):
    if name in SIGNALS:
        return SIGNALS[name]
    rng = np.random.default_rng(11)
    n = 13000   # > 3 blocks at 4096, with a partial tail
    sines = np.stack([sine(n, 441, 12000) + sine(n, 1373, 3000),
                      sine(n, 599, 11000, 0.5)], axis=1)
    SIGNALS.update({
        "sines": sines,
        "noise": rng.integers(-32768, 32768, (n, 2)).astype(np.int32),
        "wasted": sines & ~7,
        "mono": sines[:, :1],
        "quiet": (sines // 1024),
        "mixed": np.concatenate([np.zeros((4096, 2), np.int32),
                                 sines[:4096],
                                 np.full((4096, 2), -5, np.int32)]),
        "6ch": np.stack([sine(9000, 200 * (i + 1), 2000 * (i + 1))
                         for i in range(6)], axis=1),
    })
    return SIGNALS[name]


MODES = {
    "m0": dict(block_size=1152, max_lpc_order=0, mid_side=False,
               max_residual_partition_order=3),
    "m4": dict(block_size=4096, max_lpc_order=8, mid_side=False,
               adaptive_mid_side=True, max_residual_partition_order=4),
    "m5": dict(block_size=4096, max_lpc_order=8, mid_side=True,
               max_residual_partition_order=5),
    "m8": dict(block_size=4096, max_lpc_order=12, mid_side=True,
               exhaustive_model_search=True,
               max_residual_partition_order=6),
}


@pytest.mark.parametrize("mode", list(MODES.keys()))
@pytest.mark.parametrize("signal", ["sines", "noise", "wasted", "mono",
                                    "quiet", "mixed", "6ch"])
def test_fast_matches_oracle_bytes(signal, mode):
    arr = get_signal(signal)
    opts = MODES[mode]
    b1 = io.BytesIO()
    b2 = io.BytesIO()
    o1 = oracle_encode(b1, make_reader(arr), padding_bytes=None, **opts)
    o2 = encode_flac_fast(b2, make_reader(arr), padding_size=None,
                          backend="numpy", **opts)
    assert b1.getvalue() == b2.getvalue()
    assert o1 == o2


@pytest.mark.parametrize("bps", [8, 24])
def test_fast_matches_oracle_other_bps(bps):
    rng = np.random.default_rng(5)
    scale = 1 << (bps - 2)
    arr = np.stack([
        (sine(9000, 441, scale).astype(np.int64) +
         rng.integers(-scale // 64, scale // 64, 9000)),
        sine(9000, 599, scale // 2).astype(np.int64)],
        axis=1).astype(np.int32)
    opts = MODES["m8"]
    b1 = io.BytesIO()
    b2 = io.BytesIO()
    oracle_encode(b1, make_reader(arr, bps=bps), padding_bytes=None,
                  **opts)
    encode_flac_fast(b2, make_reader(arr, bps=bps), padding_size=None,
                     backend="numpy", **opts)
    assert b1.getvalue() == b2.getvalue()


def test_native_decoder_matches_oracle_decoder():
    arr = get_signal("sines")
    buf = io.BytesIO()
    encode_flac_fast(buf, make_reader(arr), backend="numpy",
                     **MODES["m8"])
    buf.seek(0)
    d = FlacDecoder(buf)
    out = []
    f = d.read(1 << 20)
    while len(f) > 0:
        out.append(f.samples)
        f = d.read(1 << 20)
    assert np.array_equal(np.concatenate(out), arr)

    # native C++ decoder over the raw frame bytes
    from audiotools_tpu import _native
    data = buf.getvalue()
    # STREAMINFO only (padding_size default): locate first frame by
    # walking metadata blocks
    import audiotools_tpu.bitstream as bs
    r = bs.BitstreamReader(data, False)
    r.skip_bytes(4)
    last = 0
    while last != 1:
        (last, _btype, blen) = r.parse("1u 7u 24u")
        r.skip_bytes(blen)
    offset = r.source.tell()
    (samples, consumed) = _native.flac_decode(data[offset:], 16, 2,
                                              len(arr))
    assert consumed == len(data) - offset
    assert np.array_equal(samples, arr)


def test_fast_encoder_via_flacaudio():
    """the production FlacAudio path uses the fast encoder"""
    import tempfile
    import os
    import audiotools_tpu as at
    from audiotools_tpu.formats.flac import FlacAudio

    arr = get_signal("sines")
    tmp = tempfile.mktemp(suffix=".flac")
    try:
        flac = FlacAudio.from_pcm(tmp, make_reader(arr), "8")
        assert flac.verify()
        assert at.pcm_cmp(make_reader(arr), flac.to_pcm())
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def test_rice_search_max_rice_above_bitwidth():
    """max_rice may exceed the residual bit budget J (e.g. an 8-bit
    stream analyzed with the 24-bit path's max_rice=30): parameters
    r >= J have sum(u >> r) == 0 exactly, and the search must neither
    crash nor change its answer vs a max_rice that already covers the
    optimum (totals grow strictly past J, so argmin is unaffected)"""
    from audiotools_tpu.ops import flac_frames, lpc as lpc_ops

    rng = np.random.default_rng(5)
    n = 1024
    base = sine(n, 441, 100)
    blocks = np.clip(np.stack([base + rng.integers(-3, 4, n),
                               (0.7 * base).astype(np.int32)], axis=1),
                     -128, 127).astype(np.int32).reshape(1, n, 2)
    window = lpc_ops.tukey_window_df(n)
    porders = flac_frames.valid_partition_orders(n, 4, 8)

    outs = []
    for max_rice in (14, 30):
        outs.append(np.asarray(flac_frames.analyze_frames_packed(
            np, blocks, True, 8, n, 8, 14, list(porders), max_rice,
            True, True, window)))
    assert np.array_equal(outs[0], outs[1])
