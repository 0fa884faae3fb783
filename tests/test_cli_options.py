"""Black-box coverage of the round-2 CLI option additions:
tracktag --remove-* / --comment-file, trackverify summary/-t,
trackcmp -S, audiotools-config persisted settings, trackplay RG
flags, track2cd --cue, covertag --replace.

Reference counterparts: the same flags on the reference's executables
(tracktag/trackverify/trackcmp/audiotools-config/...).
"""

import io
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from cli_harness import run_tool  # noqa: E402

from audiotools_tpu import pcm  # noqa: E402
from audiotools_tpu.pcmstream import PCMReader  # noqa: E402
from audiotools_tpu.formats.flac import FlacAudio  # noqa: E402


def _make_flac(path, seconds=1):
    n = 44100 * seconds
    t = np.arange(n)
    arr = np.clip(
        6000 * np.sin(2 * np.pi * 440 * t / 44100)[:, None] +
        np.zeros((n, 2)), -32768, 32767).astype(np.int32)
    raw = pcm.FrameList._wrap(arr, 16).to_bytes(False, True)
    return FlacAudio.from_pcm(
        str(path), PCMReader(io.BytesIO(raw), 44100, 2, 3, 16))


def test_tracktag_remove_fields(tmp_path):
    f = _make_flac(tmp_path / "a.flac")
    r = run_tool("tracktag", "--name", "Song", "--artist", "Artist",
                 "--year", "2001", f.filename)
    assert r.returncode == 0
    meta = FlacAudio(f.filename).get_metadata()
    assert meta.track_name == "Song"
    assert meta.artist_name == "Artist"
    r = run_tool("tracktag", "--remove-artist", "--remove-year",
                 f.filename)
    assert r.returncode == 0
    meta = FlacAudio(f.filename).get_metadata()
    assert meta.track_name == "Song"       # untouched
    assert meta.artist_name is None
    assert meta.year is None


def test_tracktag_comment_file(tmp_path):
    f = _make_flac(tmp_path / "a.flac")
    comment = tmp_path / "comment.txt"
    comment.write_text("liner notes", encoding="utf-8")
    r = run_tool("tracktag", "--comment-file", str(comment),
                 f.filename)
    assert r.returncode == 0
    assert FlacAudio(f.filename).get_metadata().comment == \
        "liner notes"


def test_tracktag_comment_file_not_utf8(tmp_path):
    f = _make_flac(tmp_path / "a.flac")
    comment = tmp_path / "comment.bin"
    comment.write_bytes(b"\xff\xfe\x00bad")
    r = run_tool("tracktag", "--comment-file", str(comment),
                 f.filename)
    assert r.returncode == 1


def test_trackverify_summary_and_type_filter(tmp_path):
    f = _make_flac(tmp_path / "a.flac")
    r = run_tool("trackverify", f.filename)
    assert r.returncode == 0
    assert "Results" in r.stdout
    r = run_tool("trackverify", "-S", f.filename)
    assert "Results" not in r.stdout
    # -t with a non-matching type verifies nothing (and succeeds)
    r = run_tool("trackverify", "-t", "wav", f.filename)
    assert r.returncode == 0
    assert "OK" not in r.stdout.replace("Results", "")


def test_trackcmp_summary(tmp_path):
    f1 = _make_flac(tmp_path / "a.flac")
    f2 = _make_flac(tmp_path / "b.flac")
    r = run_tool("trackcmp", f1.filename, f2.filename)
    assert r.returncode == 0
    assert "1/1 OK" in r.stdout
    r = run_tool("trackcmp", "-S", f1.filename, f2.filename)
    assert "1/1 OK" not in r.stdout


def test_config_settings_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setenv("HOME", str(tmp_path))
    r = run_tool("audiotools-config", "--freedb-server", "example.org",
                 "--joint", "3", "--cdrom-read-offset", "12")
    assert r.returncode == 0
    cfg = (tmp_path / ".audiotools.cfg").read_text()
    assert "example.org" in cfg
    assert "maximum_jobs = 3" in cfg
    assert "cdrom_read_offset = 12" in cfg


def test_config_rejects_bad_quality(tmp_path, monkeypatch):
    monkeypatch.setenv("HOME", str(tmp_path))
    r = run_tool("audiotools-config", "-t", "flac", "-q", "99")
    assert r.returncode == 1


def test_track2cd_cue_image_split(tmp_path):
    # a 2-track cuesheet over one 4-second image -> 2 INDEX entries
    f = _make_flac(tmp_path / "album.flac", seconds=4)
    cue = tmp_path / "album.cue"
    cue.write_text(
        'FILE "album.bin" BINARY\n'
        "  TRACK 01 AUDIO\n"
        "    INDEX 01 00:00:00\n"
        "  TRACK 02 AUDIO\n"
        "    INDEX 01 00:02:00\n")
    image = tmp_path / "img"
    r = run_tool("track2cd", "--cue", str(cue),
                 "--image", str(image), f.filename)
    assert r.returncode == 0, r
    cue_out = (tmp_path / "img.cue").read_text()
    assert cue_out.count("TRACK") == 2
    assert (tmp_path / "img.bin").stat().st_size % 2352 == 0


def test_covertag_replace(tmp_path):
    import zlib
    import struct

    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data +
                struct.pack(">I", zlib.crc32(typ + data)))

    ihdr = struct.pack(">IIBBBBB", 4, 3, 8, 2, 0, 0, 0)
    png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) +
           chunk(b"IDAT", zlib.compress(b"\x00" * 39)) +
           chunk(b"IEND", b""))
    p1 = tmp_path / "c1.png"
    p1.write_bytes(png)
    f = _make_flac(tmp_path / "a.flac")
    r = run_tool("covertag", "--front-cover", str(p1), f.filename)
    assert r.returncode == 0
    assert len(FlacAudio(f.filename).get_metadata().images()) == 1
    # --replace swaps instead of appending
    r = run_tool("covertag", "-r", "--front-cover", str(p1),
                 f.filename)
    assert r.returncode == 0
    assert len(FlacAudio(f.filename).get_metadata().images()) == 1


def test_trackplay_replaygain_flags_accepted(tmp_path):
    # NULL output, non-tty: the line mode plays through instantly
    f = _make_flac(tmp_path / "a.flac")
    r = run_tool("trackplay", "-o", "NULL", "--track-replaygain",
                 f.filename, env={"ATPU_NULL_REALTIME": "0"})
    assert r.returncode == 0
