"""Device (JAX) FLAC decode path: byte-exactness vs the host decoder
and the oracle, unit tests for the vectorized Rice kernel and the
fused synthesis scan, and decoder-level behaviors (seek, MD5,
truncation, fallbacks).

The decode blueprint (SURVEY.md §7 step 5, reference hot loop
/root/reference/src/decoders/flac.c:174-260,1156-1193): host
structural scan -> batched pointer-doubling Rice decode -> fused
synthesis scans -> stereo reconstruction."""

import glob
import io
import os

import numpy as np
import pytest

from conftest import REFERENCE_DIR, reference_available

from audiotools_tpu import pcm
from audiotools_tpu.ops import flac_synth, rice_decode


# ---------------------------------------------------------------------
# rice_decode unit tests (numpy backend = the spec; jax cross-checked)
# ---------------------------------------------------------------------

def _encode_rice(values, k):
    """bit-serial Rice encoder (test oracle): returns a bit list"""
    bits = []
    for v in values:
        u = (v << 1) if v >= 0 else (((-v - 1) << 1) | 1)
        q = u >> k
        bits.extend([0] * q + [1])
        for b in range(k - 1, -1, -1):
            bits.append((u >> b) & 1)
    return bits


def _encode_raw(values, width):
    bits = []
    for v in values:
        u = v & ((1 << width) - 1) if width else 0
        for b in range(width - 1, -1, -1):
            bits.append((u >> b) & 1)
    return bits


def _bits_to_words(bits):
    pad = (-len(bits)) % 32
    bits = bits + [0] * pad
    words = []
    for w in range(len(bits) // 32):
        acc = 0
        for b in bits[w * 32:(w + 1) * 32]:
            acc = (acc << 1) | b
        words.append(acc)
    return np.array(words, dtype=np.uint32)


def _decode_partitions(xp, words, metas, W, C):
    """driver: metas = [(bit_off, k, raw_bits, count, expected)]"""
    word_base = np.array([m[0] >> 5 for m in metas], dtype=np.int32)
    base_bits = np.array([m[0] & 31 for m in metas], dtype=np.int32)
    k = np.array([m[1] for m in metas], dtype=np.int32)
    raw = np.array([m[2] for m in metas], dtype=np.int32)
    count = np.array([m[3] for m in metas], dtype=np.int32)
    if xp is not np:
        words = xp.asarray(words)
    return np.asarray(rice_decode.decode_partitions(
        xp, words, word_base, base_bits, k, raw, count, W, C))


@pytest.mark.parametrize("k", [0, 1, 4, 10, 14])
def test_rice_kernel_roundtrip(k):
    rng = np.random.default_rng(1234 + k)
    values = (rng.integers(-(1 << (k + 2)), 1 << (k + 2), 60)
              .astype(int).tolist())
    bits = _encode_rice(values, k)
    words = _bits_to_words(bits)
    out = _decode_partitions(
        np, words, [(0, k, -1, len(values), values)], 64, 64)
    assert out[0, :len(values)].tolist() == values
    assert (out[0, len(values):] == 0).all()


def test_rice_kernel_mixed_partitions_and_offsets():
    """several partitions at arbitrary bit offsets in one buffer,
    mixing Rice and raw (escape/verbatim) runs"""
    rng = np.random.default_rng(7)
    metas = []
    bits = [1, 0, 1]     # garbage prefix (odd offset)
    specs = [(3, -1, 17), (0, -1, 64), (-1, 5, 30), (7, -1, 64),
             (-1, 0, 12), (-1, 26, 9)]
    for (k, raw, count) in specs:
        off = len(bits)
        if raw >= 0:
            lo = -(1 << (raw - 1)) if raw else 0
            hi = (1 << (raw - 1)) if raw else 1
            vals = rng.integers(lo, hi, count).astype(int).tolist()
            bits.extend(_encode_raw(vals, raw))
        else:
            lim = 1 << (k + 2)
            vals = rng.integers(-lim, lim, count).astype(int).tolist()
            bits.extend(_encode_rice(vals, k))
        metas.append((off, k if raw < 0 else -1, raw, count, vals))
    words = _bits_to_words(bits)
    out = _decode_partitions(np, words, metas, 64, 64)
    for (row, m) in enumerate(metas):
        assert out[row, :m[3]].tolist() == m[4], "partition %d" % row


def test_rice_kernel_jax_matches_numpy():
    jnp = pytest.importorskip("jax.numpy")
    import jax
    jax.config.update("jax_enable_x64", True)
    rng = np.random.default_rng(99)
    bits = []
    metas = []
    for (k, count) in [(2, 64), (9, 64), (0, 5)]:
        off = len(bits)
        vals = rng.integers(-500, 500, count).astype(int).tolist()
        bits.extend(_encode_rice(vals, k))
        metas.append((off, k, -1, count, vals))
    words = _bits_to_words(bits)
    a = _decode_partitions(np, words, metas, 64, 64)
    b = _decode_partitions(jnp, words, metas, 64, 64)
    assert (a == b).all()


def test_rice_kernel_long_unary_quotient():
    """a quotient spanning multiple words decodes exactly"""
    vals = [1000, -3, 7]
    bits = _encode_rice(vals, 0)
    words = _bits_to_words(bits)
    out = _decode_partitions(np, words, [(0, 0, -1, 3, vals)], 64, 64)
    assert out[0, :3].tolist() == vals


# ---------------------------------------------------------------------
# synthesis unit tests
# ---------------------------------------------------------------------

def _scalar_synth(residuals, warmup, qlp, shift, order):
    n = len(residuals)
    s = np.zeros(n, dtype=np.int64)
    s[:order] = warmup[:order]
    for i in range(order, n):
        acc = 0
        for j in range(order):
            acc += int(qlp[j]) * int(s[i - 1 - j])
        s[i] = residuals[i] + (acc >> shift)
    return s.astype(np.int32)


@pytest.mark.parametrize("order,shift", [(1, 0), (4, 3), (8, 12),
                                         (12, 14), (32, 15)])
def test_synthesize_matches_scalar(order, shift):
    rng = np.random.default_rng(order * 100 + shift)
    n = 256
    S = 5
    residuals = rng.integers(-4000, 4000, (S, n)).astype(np.int32)
    warmup = np.zeros((S, flac_synth.K), dtype=np.int32)
    warmup[:, :order] = rng.integers(-30000, 30000, (S, order))
    qlp = np.zeros((S, flac_synth.K), dtype=np.int32)
    # stable filters: sum |q| <= 2^shift keeps |pred| <= max |s|, so
    # the recurrence grows linearly and stays inside int32
    raw = rng.integers(-(1 << 13), 1 << 13, (S, order))
    denom = np.abs(raw).sum(axis=1, keepdims=True) + 1
    qlp[:, :order] = raw * (1 << shift) // denom
    shifts = np.full(S, shift, dtype=np.int32)
    orders = np.full(S, order, dtype=np.int32)
    out = flac_synth.synthesize(np, residuals, warmup, qlp,
                                shifts, orders, n)
    for s in range(S):
        expect = _scalar_synth(residuals[s], warmup[s], qlp[s],
                               shift, order)
        assert (out[s] == expect).all()


def test_synthesize_jax_matches_numpy():
    jnp = pytest.importorskip("jax.numpy")
    import jax
    jax.config.update("jax_enable_x64", True)
    rng = np.random.default_rng(11)
    n = 192
    S = 6
    residuals = rng.integers(-9000, 9000, (S, n)).astype(np.int32)
    warmup = rng.integers(-30000, 30000,
                          (S, flac_synth.K)).astype(np.int32)
    shifts = rng.integers(0, 15, S).astype(np.int32)
    raw = rng.integers(-(1 << 13), 1 << 13, (S, flac_synth.K))
    denom = np.abs(raw).sum(axis=1, keepdims=True) + 1
    qlp = (raw * (1 << shifts)[:, None] // denom).astype(np.int32)
    orders = np.array([0, 1, 4, 8, 12, 32], dtype=np.int32)
    a = flac_synth.synthesize(np, residuals, warmup, qlp,
                              shifts, orders, n)
    b = np.asarray(flac_synth.synthesize(
        jnp, jnp.asarray(residuals), jnp.asarray(warmup),
        jnp.asarray(qlp), jnp.asarray(shifts), jnp.asarray(orders), n))
    assert (a == b).all()


# ---------------------------------------------------------------------
# decoder-level byte-exactness
# ---------------------------------------------------------------------

def make_reader(kind, bps, channels, n):
    """a deterministic PCMReader test signal"""
    import zlib
    from audiotools_tpu.pcmstream import PCMReader
    SR = 44100
    seed = zlib.crc32(f"{kind}/{bps}/{channels}".encode())
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    amp = 1 << (bps - 3)
    if kind == "tone":
        base = amp * np.sin(2 * np.pi * 441 * t / SR)
    else:
        base = rng.integers(-amp, amp, n).astype(np.float64)
    chs = [np.roll(base, 37 * i) for i in range(channels)]
    arr = np.stack(chs, 1).astype(np.int64).astype(np.int32)
    fl = pcm.FrameList._wrap(arr, bps)
    mask = {1: 0x4, 2: 0x3, 3: 0x7, 4: 0x33, 5: 0x37, 6: 0x3F,
            7: 0x13F, 8: 0x63F}[channels]
    return PCMReader(io.BytesIO(fl.to_bytes(False, bps > 8)),
                     SR, channels, mask, bps)


def drain_bytes(dec):
    out = []
    while True:
        fl = dec.read(65536)
        if fl.frames == 0:
            return b"".join(out)
        out.append(fl.to_bytes(False, True))


def encode_flac(path, reader, **opts):
    from audiotools_tpu.codecs.flac_enc_fast import encode_flac_fast
    encode_flac_fast(path, reader, backend="numpy", **opts)


def jax_vs_native(path):
    from audiotools_tpu.codecs.flac_dec_fast import FastFlacDecoder
    from audiotools_tpu.codecs.flac_dec_jax import JaxFlacDecoder
    a = drain_bytes(FastFlacDecoder(path))
    b = drain_bytes(JaxFlacDecoder(path))
    assert a == b
    return a


# every (channels, bucket-layout) signature compiles a fresh XLA
# program (~10-30 s each on this 1-core box): the default run keeps
# one stereo representative; the full matrix is the slow battery
@pytest.mark.parametrize("bps,channels,kind", [
    (16, 2, "tone"),
    pytest.param(16, 1, "noise", marks=pytest.mark.slow),
    pytest.param(24, 2, "noise", marks=pytest.mark.slow),
    pytest.param(8, 2, "tone", marks=pytest.mark.slow),
    pytest.param(16, 6, "noise", marks=pytest.mark.slow),
    pytest.param(24, 8, "tone", marks=pytest.mark.slow),
])
def test_jax_decode_matches_native(tmp_path, bps, channels, kind):
    path = str(tmp_path / "t.flac")
    encode_flac(path, make_reader(kind, bps, channels, 44100),
                block_size=4096, max_lpc_order=12,
                mid_side=channels == 2, exhaustive_model_search=False,
                max_residual_partition_order=6)
    data = jax_vs_native(path)
    assert len(data) == 44100 * channels * (bps // 8)


@pytest.mark.slow
def test_jax_decode_small_blocks(tmp_path):
    """block sizes that stress partition/window bucketing"""
    for block_size in (192, 256, 1152):
        path = str(tmp_path / ("b%d.flac" % block_size))
        encode_flac(path, make_reader("noise", 16, 2, 20000),
                    block_size=block_size, max_lpc_order=8,
                    mid_side=True, exhaustive_model_search=False,
                    max_residual_partition_order=4)
        jax_vs_native(path)


def test_jax_decode_verbatim_and_constant(tmp_path):
    """constant + verbatim subframes through the device path"""
    from audiotools_tpu.pcmstream import PCMReader
    rng = np.random.default_rng(3)
    flat = np.zeros((9000, 2), dtype=np.int32)
    flat[4096:8192, 0] = rng.integers(-32768, 32767, 4096)
    flat[4096:8192, 1] = 777     # constant right channel
    fl = pcm.FrameList._wrap(flat, 16)
    reader = PCMReader(io.BytesIO(fl.to_bytes(False, True)),
                       44100, 2, 3, 16)
    path = str(tmp_path / "vc.flac")
    encode_flac(path, reader, block_size=4096, max_lpc_order=8,
                mid_side=False, exhaustive_model_search=False,
                max_residual_partition_order=4)
    data = jax_vs_native(path)
    got = np.frombuffer(data, dtype="<i2").reshape(-1, 2)
    assert (got == flat).all()


def test_jax_decode_seek(tmp_path):
    from audiotools_tpu.codecs.flac_dec_jax import JaxFlacDecoder
    path = str(tmp_path / "s.flac")
    encode_flac(path, make_reader("tone", 16, 2, 44100 * 3),
                block_size=4096, max_lpc_order=8, mid_side=True,
                exhaustive_model_search=False, max_residual_partition_order=4)
    full = np.frombuffer(jax_vs_native(path), dtype="<i2").reshape(-1, 2)
    dec = JaxFlacDecoder(path)
    landed = dec.seek(50000)
    assert landed <= 50000
    rest = np.frombuffer(drain_bytes(dec), dtype="<i2").reshape(-1, 2)
    assert (rest == full[landed:]).all()


def test_jax_decode_md5_mismatch(tmp_path):
    """a corrupted stream still fails the EOF MD5 check"""
    from audiotools_tpu.codecs.flac_dec_jax import JaxFlacDecoder
    path = str(tmp_path / "m.flac")
    encode_flac(path, make_reader("noise", 16, 2, 30000),
                block_size=4096, max_lpc_order=8, mid_side=True,
                exhaustive_model_search=False, max_residual_partition_order=4)
    with open(path, "r+b") as f:
        # corrupt the STREAMINFO MD5 itself (frame data stays valid)
        f.seek(26)
        raw = bytearray(f.read(16))
        raw[0] ^= 0xFF
        f.seek(26)
        f.write(bytes(raw))
    with pytest.raises(ValueError):
        drain_bytes(JaxFlacDecoder(path))


def test_jax_decode_truncated_stream(tmp_path):
    from audiotools_tpu.codecs.flac_dec_jax import JaxFlacDecoder
    path = str(tmp_path / "t.flac")
    encode_flac(path, make_reader("noise", 16, 2, 60000),
                block_size=4096, max_lpc_order=8, mid_side=True,
                exhaustive_model_search=False, max_residual_partition_order=4)
    data = open(path, "rb").read()
    cut = io.BytesIO(data[:len(data) - len(data) // 3])
    with pytest.raises(ValueError):
        drain_bytes(JaxFlacDecoder(cut))


# a small default-run subset keeps corpus coverage cheap (each new
# shape signature is a fresh XLA compile); the slow sweep decodes
# every fixture
DEFAULT_FIXTURES = ("flac-allframes.flac", "flac-disordered.flac")


@pytest.mark.skipif(not reference_available(),
                    reason="reference fixtures absent")
@pytest.mark.parametrize("name", DEFAULT_FIXTURES)
def test_jax_decode_reference_fixture_subset(name):
    jax_vs_native(os.path.join(REFERENCE_DIR, "test", name))


@pytest.mark.slow
@pytest.mark.skipif(not reference_available(),
                    reason="reference fixtures absent")
def test_jax_decode_reference_fixtures():
    """every reference fixture decodes byte-identically to the host
    decoder through the device path (1h/1m excluded; 1m covered by
    the long sweep below)"""
    for path in sorted(glob.glob(
            os.path.join(REFERENCE_DIR, "test", "*.flac"))):
        name = os.path.basename(path)
        if name in ("1h.flac", "1m.flac", "flac-id3.flac",
                    "flac-id3-2.flac"):
            continue
        jax_vs_native(path)


@pytest.mark.slow
@pytest.mark.skipif(not reference_available(),
                    reason="reference fixtures absent")
def test_jax_decode_reference_fixtures_long():
    jax_vs_native(os.path.join(REFERENCE_DIR, "test", "1m.flac"))


def test_jax_backend_dispatch(tmp_path, monkeypatch):
    """ATPU_FLAC_DEC_BACKEND=jax routes FlacAudio.to_pcm through the
    device decoder"""
    from audiotools_tpu.codecs import flac as flac_codec
    from audiotools_tpu.codecs.flac_dec_jax import JaxFlacDecoder
    path = str(tmp_path / "d.flac")
    encode_flac(path, make_reader("tone", 16, 2, 22050),
                block_size=4096, max_lpc_order=8, mid_side=True,
                exhaustive_model_search=False, max_residual_partition_order=4)
    monkeypatch.setenv("ATPU_FLAC_DEC_BACKEND", "jax")
    dec = flac_codec.decoder_for_file(path)
    assert isinstance(dec, JaxFlacDecoder)
    drain_bytes(dec)


def test_scan_tolerates_any_truncation_point():
    """a buffer boundary may land ANYWHERE inside a frame — header
    fields, CRC-8 byte, subframe data: the scan must stop cleanly at
    the last complete frame (callers refill and rescan), never
    hard-fail a valid stream (the decode-ahead path cuts mid-frame
    routinely)"""
    import io as _io

    from audiotools_tpu import _native
    from audiotools_tpu.codecs.flac_dec_fast import FastFlacDecoder
    from audiotools_tpu.codecs.flac_enc_fast import encode_flac_fast
    from audiotools_tpu.pcmstream import PCMReader
    from audiotools_tpu import pcm as _pcm

    rng = np.random.default_rng(17)
    arr = np.cumsum(rng.integers(-300, 301, (4096 * 4, 2)),
                    axis=0).astype(np.int32)
    arr = np.clip(arr, -32768, 32767).astype(np.int32)
    buf = _io.BytesIO()
    encode_flac_fast(
        buf,
        PCMReader(_io.BytesIO(_pcm.FrameList._wrap(arr, 16)
                              .to_bytes(False, True)),
                  44100, 2, 3, 16),
        backend="numpy", block_size=4096, max_lpc_order=8,
        mid_side=True, exhaustive_model_search=False,
        max_residual_partition_order=4)
    data = buf.getvalue()
    dec = FastFlacDecoder(_io.BytesIO(data))
    frames = data[dec.frames_offset:]

    full = _native.flac_scan(frames, 16, 2, max_samples=1 << 30,
                             max_frames=64, max_parts=8192,
                             chunk_codes=64)
    assert full["total_pcm_frames"] == arr.shape[0]

    # sweep cut points across the second frame (its header included)
    first_len = int(full["frame_meta"][0, 3])
    for cut in range(first_len - 3, first_len + 40):
        scan = _native.flac_scan(
            frames[:cut], 16, 2, max_samples=1 << 30,
            max_frames=64, max_parts=8192, chunk_codes=64)
        assert scan["consumed_bytes"] <= cut
        # every complete frame before the cut must still parse
        expect = 1 if cut >= first_len else 0
        assert scan["frame_meta"].shape[0] == expect, (cut,)
