"""FLAC codec and format tests.

Modeled on the reference FLAC suites (test/test_formats.py:3006
FlacFileTest, :4075 test_python_codec): encoder/decoder roundtrips over
parameterized signals at 1-6 channels x 8/16/24 bits, decode verification
of reference-produced fixture files (STREAMINFO MD5 as oracle), metadata
block handling, and seektable construction.
"""

import io
import os
import tempfile

import numpy as np
import pytest

import audiotools_tpu as at
from audiotools_tpu import pcm
from audiotools_tpu.pcmstream import PCMReader, ChannelMask
from audiotools_tpu.ref.flac_enc import encode_flac
from audiotools_tpu.ref.flac_dec import FlacDecoder

from conftest import reference_available

REF_TEST = "/root/reference/test"


def make_reader(arr, sr=44100, bps=16):
    arr = np.asarray(arr, dtype=np.int32)
    if arr.ndim == 1:
        arr = arr.reshape(-1, 1)
    fl = pcm.FrameList._wrap(arr, bps)
    mask = (int(ChannelMask.from_channels(arr.shape[1]))
            if arr.shape[1] <= 2 else 0)
    return PCMReader(io.BytesIO(fl.to_bytes(False, True)),
                     sr, arr.shape[1], mask, bps)


def decode_all(flac_bytes):
    d = FlacDecoder(io.BytesIO(flac_bytes))
    out = []
    f = d.read(1 << 20)
    while len(f) > 0:
        out.append(f.samples)
        f = d.read(1 << 20)
    return np.concatenate(out, axis=0) if out else np.zeros((0, 1))


def encode_to_bytes(arr, bps=16, **options):
    buf = io.BytesIO()
    encode_flac(buf, make_reader(arr, bps=bps), **options)
    return buf.getvalue()


def sine(n, freqs, amps, phase=0.0):
    t = np.arange(n)
    out = np.zeros(n)
    for (f, a) in zip(freqs, amps):
        out += a * np.sin(2 * np.pi * f * t / 44100 + phase)
    return out.astype(np.int32)


@pytest.mark.parametrize("bps", [8, 16, 24])
def test_roundtrip_sine(bps):
    scale = (1 << (bps - 1)) - 1
    n = 9000
    left = (sine(n, [441, 1201], [0.4, 0.2]) * scale /
            32767).astype(np.int32) if bps != 16 else \
        sine(n, [441, 1201], [12000, 6000])
    right = sine(n, [599], [min(scale // 2, 9000)])
    arr = np.stack([left, right], axis=1)
    data = encode_to_bytes(arr, bps=bps,
                           block_size=4096, max_lpc_order=12,
                           mid_side=True, exhaustive_model_search=True,
                           max_residual_partition_order=6)
    assert np.array_equal(decode_all(data), arr)


@pytest.mark.parametrize("channels", [1, 2, 4, 6])
def test_roundtrip_channels(channels):
    rng = np.random.default_rng(7)
    base = sine(5000, [441], [8000])
    arr = np.stack([base + rng.integers(-50, 50, 5000)
                    for _ in range(channels)], axis=1).astype(np.int32)
    data = encode_to_bytes(arr, block_size=1152, max_lpc_order=8)
    assert np.array_equal(decode_all(data), arr)


def test_roundtrip_extremes():
    cases = [
        np.zeros((3000, 2), dtype=np.int32),                  # silence
        np.full((3000, 2), -32768, dtype=np.int32),           # constant min
        np.tile(np.array([[32767, -32768]], dtype=np.int32),
                (3000, 1)),                                   # fsd pattern
        (sine(4000, [441], [4000]) & ~15).reshape(-1, 1),     # wasted bits
    ]
    for arr in cases:
        data = encode_to_bytes(arr, block_size=4096, max_lpc_order=12,
                               mid_side=(arr.shape[1] == 2),
                               exhaustive_model_search=True,
                               max_residual_partition_order=6)
        assert np.array_equal(decode_all(data), arr)


def test_roundtrip_noise_all_modes():
    rng = np.random.default_rng(3)
    arr = rng.integers(-32768, 32768, (5000, 2)).astype(np.int32)
    for opts in [dict(block_size=1152, max_lpc_order=0,
                      max_residual_partition_order=3),
                 dict(block_size=4096, max_lpc_order=8, mid_side=True,
                      max_residual_partition_order=5),
                 dict(block_size=4096, max_lpc_order=12, mid_side=True,
                      exhaustive_model_search=True,
                      max_residual_partition_order=6)]:
        data = encode_to_bytes(arr, **opts)
        assert np.array_equal(decode_all(data), arr)


def test_frame_offsets_returned():
    arr = np.stack([sine(10000, [441], [1000])] * 2, axis=1)
    buf = io.BytesIO()
    offsets = encode_flac(buf, make_reader(arr), block_size=4096)
    assert [frames for (_, frames) in offsets] == [4096, 4096, 1808]
    assert offsets[0][0] == 0
    # byte offsets are ascending
    assert all(a[0] < b[0] for (a, b) in zip(offsets, offsets[1:]))


@pytest.mark.skipif(not reference_available(),
                    reason="reference fixtures unavailable")
@pytest.mark.parametrize("fixture", ["1s.flac", "tone.flac",
                                     "flac-allframes.flac",
                                     "tone5.flac"])
def test_decode_reference_fixtures(fixture):
    """decoding reference-encoded files must pass their MD5 check"""
    d = FlacDecoder(os.path.join(REF_TEST, fixture))
    total = 0
    f = d.read(1 << 20)
    while len(f) > 0:
        total += f.frames
        f = d.read(1 << 20)  # raises on MD5 mismatch at EOF
    assert total == d.total_frames


@pytest.mark.skipif(not reference_available(),
                    reason="reference fixtures unavailable")
def test_flacaudio_end_to_end():
    from audiotools_tpu.formats.wav import WaveAudio
    from audiotools_tpu.formats.flac import FlacAudio

    wav = WaveAudio(os.path.join(REF_TEST, "wav-2ch.wav"))
    tmp = tempfile.mktemp(suffix=".flac")
    try:
        flac = wav.convert(tmp, FlacAudio, "8")
        assert flac.verify()
        assert flac.lossless()
        assert at.pcm_cmp(wav.to_pcm(), flac.to_pcm())
        assert type(at.open(tmp)) is FlacAudio
        assert flac.total_frames() == wav.total_frames()
        assert flac.sample_rate() == 44100
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


@pytest.mark.skipif(not reference_available(),
                    reason="reference fixtures unavailable")
def test_flacaudio_metadata():
    from audiotools_tpu.formats.flac import (FlacAudio, Flac_SEEKTABLE,
                                             Flac_PADDING)

    src = FlacAudio(os.path.join(REF_TEST, "1s.flac"))
    tmp = tempfile.mktemp(suffix=".flac")
    try:
        flac = src.convert(tmp, FlacAudio, "5")
        metadata = flac.get_metadata()
        assert metadata.has_block(Flac_SEEKTABLE.BLOCK_ID)
        assert metadata.has_block(Flac_PADDING.BLOCK_ID)

        md = at.MetaData(track_name="Name", track_number=5,
                         album_name="Album", year="2026")
        flac.set_metadata(md)
        got = at.open(tmp).get_metadata()
        assert got.track_name == "Name"
        assert got.track_number == 5
        assert got.album_name == "Album"
        assert got.year == "2026"
        # in-place update must not corrupt the stream
        assert at.open(tmp).verify()

        at.open(tmp).delete_metadata()
        assert at.open(tmp).get_metadata().track_name is None
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def test_seektable_from_offsets():
    from audiotools_tpu.formats.flac import seektable_from_offsets
    offsets = [(i * 1000, 4096) for i in range(20)]
    table = seektable_from_offsets(offsets, 44100 * 10)
    # seekpoints at >= 10 second intervals: 0s and ~441000 frames
    assert table.seekpoints[0] == (0, 0, 4096)
    assert len(table.seekpoints) == 1  # only 81920 frames total


def test_mid_side_assignments_exercised():
    """craft signals favoring each stereo assignment"""
    n = 4096
    loud = sine(n, [441], [15000])
    quiet = (loud + np.arange(n) % 3).astype(np.int32)

    # identical channels: side is tiny -> mid/side or left/side wins
    arr = np.stack([loud, quiet], axis=1)
    data = encode_to_bytes(arr, mid_side=True, max_lpc_order=8)
    assert np.array_equal(decode_all(data), arr)

    # independent channels: left/right likely
    rng = np.random.default_rng(0)
    arr = np.stack([rng.integers(-30000, 30000, n),
                    rng.integers(-30000, 30000, n)],
                   axis=1).astype(np.int32)
    data = encode_to_bytes(arr, mid_side=True, max_lpc_order=8)
    assert np.array_equal(decode_all(data), arr)
