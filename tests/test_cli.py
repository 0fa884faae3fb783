"""CLI black-box tests: every tool exercised via subprocess
(mirrors the reference test/test_utils.py strategy — exit codes,
output files, metadata effects)."""

import io
import os
import sys

import numpy as np
import pytest

from audiotools_tpu import pcm
from audiotools_tpu.pcmstream import PCMReader
from audiotools_tpu.formats.wav import WaveAudio
from audiotools_tpu.formats.flac import FlacAudio

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOLS = os.path.join(REPO, "tools")
SR = 44100


from cli_harness import run_tool, run_tool_subprocess  # noqa: E402


def make_signal(n):
    t = np.arange(n)
    rng = np.random.default_rng(2)
    arr = np.stack([8000 * np.sin(2 * np.pi * 440 * t / SR) +
                    rng.normal(0, 200, n),
                    7000 * np.sin(2 * np.pi * 550 * t / SR)], axis=1)
    return np.clip(arr, -32768, 32767).astype(np.int32)


def make_reader(arr):
    fl = pcm.FrameList._wrap(arr, 16)
    return PCMReader(io.BytesIO(fl.to_bytes(False, True)),
                     SR, 2, 3, 16)


@pytest.fixture()
def wav_file(tmp_path):
    path = str(tmp_path / "input.wav")
    WaveAudio.from_pcm(path, make_reader(make_signal(SR * 2)))
    return path


@pytest.fixture()
def flac_file(tmp_path):
    path = str(tmp_path / "input.flac")
    FlacAudio.from_pcm(path, make_reader(make_signal(SR * 2)),
                       compression="5")
    return path


def test_track2track(tmp_path, wav_file):
    out = str(tmp_path / "out")
    r = run_tool("track2track", "-t", "flac", "-q", "5",
                 "-d", out, wav_file)
    assert r.returncode == 0, r.stderr
    files = os.listdir(out)
    assert len(files) == 1 and files[0].endswith(".flac")
    r2 = run_tool("trackcmp", wav_file,
                  os.path.join(out, files[0]))
    assert r2.returncode == 0
    assert "OK" in r2.stdout + r2.stderr


def test_track2track_errors(tmp_path, wav_file):
    assert run_tool("track2track", "-t", "flac", "-q", "99",
                    "-d", str(tmp_path), wav_file).returncode != 0
    assert run_tool("track2track", "-t", "flac",
                    "-d", str(tmp_path),
                    str(tmp_path / "missing.wav")).returncode != 0
    assert run_tool("track2track", "-t", "nosuch",
                    "-d", str(tmp_path), wav_file).returncode != 0


def test_trackinfo_tracklength(flac_file):
    r = run_tool("trackinfo", flac_file)
    assert r.returncode == 0
    assert "44100Hz" in r.stdout
    assert "2ch" in r.stdout
    r2 = run_tool("tracklength", flac_file)
    assert r2.returncode == 0
    assert "0:02" in r2.stdout or "2" in r2.stdout


def test_trackverify_good_and_bad(tmp_path, flac_file):
    assert run_tool("trackverify", flac_file).returncode == 0
    bad = str(tmp_path / "bad.flac")
    data = open(flac_file, "rb").read()
    open(bad, "wb").write(data[:len(data) // 2])
    assert run_tool("trackverify", bad).returncode != 0


def test_tracktag_and_trackrename(tmp_path, flac_file):
    r = run_tool("tracktag", "--name", "My Song", "--number", "3",
                 "--artist", "Artist", flac_file)
    assert r.returncode == 0, r.stderr
    md = FlacAudio(flac_file).get_metadata()
    assert md.track_name == "My Song"
    assert md.track_number == 3
    assert md.artist_name == "Artist"

    r2 = run_tool("trackrename",
                  "--format", "%(track_number)2.2d - %(track_name)s.%(suffix)s",
                  flac_file)
    assert r2.returncode == 0, r2.stderr
    renamed = [f for f in os.listdir(os.path.dirname(flac_file))
               if f.endswith(".flac")]
    assert "03 - My Song.flac" in renamed


def test_trackcat_and_tracksplit(tmp_path, wav_file):
    # concatenate the same file twice, then split it by a cuesheet
    joined = str(tmp_path / "joined.flac")
    r = run_tool("trackcat", "-t", "flac", "-o", joined,
                 wav_file, wav_file)
    assert r.returncode == 0, r.stderr
    assert FlacAudio(joined).total_frames() == SR * 4

    cue = str(tmp_path / "split.cue")
    with open(cue, "w") as f:
        f.write('FILE "joined.flac" WAVE\n'
                '  TRACK 01 AUDIO\n'
                '    INDEX 01 00:00:00\n'
                '  TRACK 02 AUDIO\n'
                '    INDEX 01 00:02:00\n')
    outdir = str(tmp_path / "split")
    r2 = run_tool("tracksplit", "-t", "flac", "--cue", cue,
                  "-d", outdir, joined)
    assert r2.returncode == 0, r2.stderr
    pieces = sorted(os.listdir(outdir))
    assert len(pieces) == 2
    total = sum(FlacAudio(os.path.join(outdir, p)).total_frames()
                for p in pieces)
    assert total == SR * 4


def test_trackcmp_detects_difference(tmp_path, wav_file):
    arr = make_signal(SR * 2)
    arr[SR] += 1
    other = str(tmp_path / "other.wav")
    WaveAudio.from_pcm(other, make_reader(arr))
    r = run_tool("trackcmp", wav_file, other)
    assert r.returncode != 0


def test_audiotools_config():
    r = run_tool("audiotools-config")
    assert r.returncode == 0
    assert "flac" in r.stdout


def test_track2track_output_flag(tmp_path, wav_file):
    out = str(tmp_path / "direct.flac")
    r = run_tool("track2track", "-t", "flac", "-o", out, wav_file)
    assert r.returncode == 0, r.stderr
    assert os.path.exists(out)
    assert run_tool("trackcmp", wav_file, out).returncode == 0


def test_tracklint_fix_and_undo(tmp_path, flac_file):
    """lint -> fix -> undo restores the byte-identical original"""
    import hashlib
    run_tool("tracktag", "--name", "  padded name  ", flac_file)
    before = hashlib.sha1(open(flac_file, "rb").read()).hexdigest()

    # report-only: problems listed, file untouched
    r = run_tool("tracklint", flac_file)
    assert r.returncode == 0
    assert "whitespace" in (r.stdout + r.stderr)
    assert hashlib.sha1(
        open(flac_file, "rb").read()).hexdigest() == before

    db = str(tmp_path / "undo.db")
    r2 = run_tool("tracklint", "--fix", "--db", db, flac_file)
    assert r2.returncode == 0, r2.stderr
    md = FlacAudio(flac_file).get_metadata()
    assert md.track_name == "padded name"
    after_fix = hashlib.sha1(open(flac_file, "rb").read()).hexdigest()
    assert after_fix != before

    r3 = run_tool("tracklint", "--undo", "--db", db, flac_file)
    assert r3.returncode == 0, r3.stderr
    restored = hashlib.sha1(open(flac_file, "rb").read()).hexdigest()
    assert restored == before

    # undo without --db errors
    assert run_tool("tracklint", "--undo", flac_file).returncode != 0


def test_track2track_metadata_lookup_offline(tmp_path, wav_file):
    """-M treats inputs as an album; offline it degrades to the
    track-numbers-only default choice"""
    out = str(tmp_path / "out")
    r = run_tool("track2track", "-t", "flac", "-d", out, "-M",
                 "--format", "%(basename)s.%(suffix)s", wav_file)
    assert r.returncode == 0, r.stderr
    from audiotools_tpu.formats.flac import FlacAudio
    files = sorted(os.listdir(out))
    md = FlacAudio(os.path.join(out, files[0])).get_metadata()
    assert md is not None
    assert md.track_number == 1


def test_tool_shim_subprocess_smoke(wav_file, tmp_path):
    """one true black-box spawn: the tools/ shim scripts themselves
    (sys.path setup + main() wiring) stay covered even though the
    rest of the suite runs in-process for speed"""
    r = run_tool_subprocess(
        "trackinfo", wav_file,
        env_extra={"ATPU_FLAC_BACKEND": "numpy"})
    assert r.returncode == 0
    assert "44100" in r.stdout
