"""Binary-gated ReplayGain for MP3 and Vorbis.

The reference applies ReplayGain to lossy formats via external
binaries (mp3gain: reference mp3.py:59,595-628; vorbisgain:
vorbis.py:44,401-465), gated on binary availability.  These tests
exercise the gating with stub executables on PATH.
"""

import os
import stat
import sys

import pytest

from audiotools_tpu.formats.mp3 import MP3Audio
from audiotools_tpu.formats.vorbis import VorbisAudio


def make_stub(tmp_path, name, marker):
    path = tmp_path / name
    path.write_text("#!/bin/sh\necho \"$@\" > %s\n" % marker)
    path.chmod(path.stat().st_mode | stat.S_IXUSR)
    return str(tmp_path)


def test_supports_and_losslessness():
    assert MP3Audio.supports_replay_gain()
    assert not MP3Audio.lossless_replay_gain()
    assert VorbisAudio.supports_replay_gain()
    assert VorbisAudio.lossless_replay_gain()
    assert MP3Audio.REPLAYGAIN_BINARIES == ("mp3gain",)
    assert VorbisAudio.REPLAYGAIN_BINARIES == ("vorbisgain",)


def test_gating_without_binary(monkeypatch, tmp_path):
    monkeypatch.setenv("PATH", str(tmp_path))   # empty dir: no bins
    assert not MP3Audio.can_add_replay_gain([])
    assert not VorbisAudio.can_add_replay_gain([])
    # add_replay_gain is a silent no-op without the binary
    calls = []
    MP3Audio.add_replay_gain(
        [], progress=lambda a, b: calls.append((a, b)))
    assert calls == [(0, 1), (1, 1)]


@pytest.mark.skipif(sys.platform == "win32", reason="sh stubs")
def test_mp3gain_invocation(monkeypatch, tmp_path, flac_file=None):
    marker = str(tmp_path / "invoked.txt")
    bindir = make_stub(tmp_path, "mp3gain", marker)
    monkeypatch.setenv("PATH", bindir + os.pathsep +
                       os.environ.get("PATH", ""))
    assert MP3Audio.can_add_replay_gain([])

    # a real (tiny) MP3 so open_files() type-matches it
    from conftest import reference_available
    src = "/root/reference/test/sine.mp3"
    if not (reference_available() and os.path.exists(src)):
        pytest.skip("no mp3 fixture")
    dst = str(tmp_path / "t.mp3")
    with open(src, "rb") as a, open(dst, "wb") as b:
        b.write(a.read())
    MP3Audio.add_replay_gain([dst])
    with open(marker) as f:
        argv = f.read().split()
    assert argv[:4] == ["-f", "-k", "-q", "-r"]
    assert argv[-1] == dst


def test_vorbis_replay_gain_reader(tmp_path):
    """replay_gain() parses the four VorbisComment tags"""
    import io
    import numpy as np
    from audiotools_tpu import pcm
    from audiotools_tpu.pcmstream import PCMReader
    from audiotools_tpu.meta.vorbiscomment import VorbisComment

    pytest.importorskip("ctypes")
    if not VorbisAudio.available():
        pytest.skip("libvorbis absent")
    arr = (1000 * np.sin(np.arange(8000) * 0.05)).astype(
        np.int32).reshape(-1, 1)
    fl = pcm.FrameList._wrap(arr, 16)
    reader = PCMReader(io.BytesIO(fl.to_bytes(False, True)),
                       44100, 1, 0x4, 16)
    path = str(tmp_path / "t.ogg")
    v = VorbisAudio.from_pcm(path, reader)
    assert v.replay_gain() is None
    md = v.get_metadata() or VorbisComment([], "test")
    md["REPLAYGAIN_TRACK_GAIN"] = ["-6.5 dB"]
    md["REPLAYGAIN_TRACK_PEAK"] = ["0.9"]
    md["REPLAYGAIN_ALBUM_GAIN"] = ["-7.0 dB"]
    md["REPLAYGAIN_ALBUM_PEAK"] = ["0.95"]
    v.update_metadata(md)
    rg = VorbisAudio(path).replay_gain()
    assert rg is not None
    assert abs(float(rg.track_gain) + 6.5) < 1e-6
    assert abs(float(rg.album_peak) - 0.95) < 1e-6
