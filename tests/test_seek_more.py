"""Seek coverage for the remaining seekable decoders (TTA, Shorten)
and boundary semantics shared by all of them: seek to 0, seek past
EOF, and repeated seeks landing on identical windows."""

import io
import os

import numpy as np
import pytest

from audiotools_tpu import pcm
from audiotools_tpu.pcmstream import PCMReader

SR = 44100


def make_signal(n):
    t = np.arange(n)
    rng = np.random.default_rng(5)
    arr = np.stack([7000 * np.sin(2 * np.pi * 441 * t / SR) +
                    rng.normal(0, 250, n),
                    6500 * np.sin(2 * np.pi * 523 * t / SR)], axis=1)
    return np.clip(arr, -32768, 32767).astype(np.int32)


def make_reader(arr):
    fl = pcm.FrameList._wrap(arr, 16)
    return PCMReader(io.BytesIO(fl.to_bytes(False, True)),
                     SR, 2, 3, 16)


def read_n(reader, n):
    out = []
    got = 0
    while got < n:
        fl = reader.read(n - got)
        if fl.frames == 0:
            break
        out.append(fl.samples)
        got += fl.frames
    return np.concatenate(out)[:n] if out else np.zeros((0, 2),
                                                        np.int32)


def encoded_file(cls, tmp_path, arr, name):
    path = str(tmp_path / name)
    cls.from_pcm(path, make_reader(arr))
    return cls(path)


@pytest.fixture(params=["tta", "shn", "wavpack", "flac"])
def seekable_track(request, tmp_path):
    arr = make_signal(SR * 4)
    if request.param == "tta":
        from audiotools_tpu.formats.tta import TrueAudio as cls
    elif request.param == "shn":
        from audiotools_tpu.formats.shn import ShortenAudio as cls
    elif request.param == "wavpack":
        from audiotools_tpu.formats.wavpack import WavPackAudio as cls
    else:
        from audiotools_tpu.formats.flac import FlacAudio as cls
    track = encoded_file(cls, tmp_path, arr,
                         "t." + cls.SUFFIX)
    return (track, arr)


def test_seek_mid_stream_window(seekable_track):
    (track, arr) = seekable_track
    reader = track.to_pcm()
    if not getattr(reader, "seekable", lambda: False)():
        pytest.skip("decoder is not seekable")
    target = SR  # 1 second in
    landed = reader.seek(target)
    assert 0 <= landed <= target
    window = read_n(reader, SR // 2)
    assert np.array_equal(window,
                          arr[landed:landed + SR // 2])
    reader.close()


def test_seek_to_zero_restarts(seekable_track):
    (track, arr) = seekable_track
    reader = track.to_pcm()
    if not getattr(reader, "seekable", lambda: False)():
        pytest.skip("decoder is not seekable")
    read_n(reader, SR)
    landed = reader.seek(0)
    assert landed == 0
    assert np.array_equal(read_n(reader, 1000), arr[:1000])
    reader.close()


def test_seek_past_eof_lands_in_stream(seekable_track):
    (track, arr) = seekable_track
    reader = track.to_pcm()
    if not getattr(reader, "seekable", lambda: False)():
        pytest.skip("decoder is not seekable")
    landed = reader.seek(arr.shape[0] * 100)
    assert 0 <= landed <= arr.shape[0]
    rest = read_n(reader, arr.shape[0])
    assert np.array_equal(rest, arr[landed:])
    reader.close()


def test_repeated_seeks_deterministic(seekable_track):
    (track, arr) = seekable_track
    reader = track.to_pcm()
    if not getattr(reader, "seekable", lambda: False)():
        pytest.skip("decoder is not seekable")
    a_land = reader.seek(SR * 2)
    a = read_n(reader, 2048)
    b_land = reader.seek(SR * 2)
    b = read_n(reader, 2048)
    assert a_land == b_land
    assert np.array_equal(a, b)
    reader.close()
