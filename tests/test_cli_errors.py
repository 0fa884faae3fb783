"""CLI error-path and cross-format black-box tests.

Mirrors the reference's per-executable error coverage
(test/test_utils.py): bad arguments, missing inputs, unwritable
outputs and truncated files must produce non-zero exit codes and a
diagnostic on stderr — never a traceback-free success or a partial
output file left behind.  Also drives track2track across every
available lossless type as a CLI-level transcode matrix.
"""

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


from cli_harness import run_tool  # noqa: E402


def make_reader(n=SR):
    t = np.arange(n)
    arr = np.stack([6000 * np.sin(2 * np.pi * 440 * t / SR),
                    5000 * np.sin(2 * np.pi * 660 * t / SR)], 1)
    arr = arr.astype(np.int32)
    fl = pcm.FrameList._wrap(arr, 16)
    return PCMReader(io.BytesIO(fl.to_bytes(False, True)),
                     SR, 2, 3, 16)


@pytest.fixture()
def wav_file(tmp_path):
    path = str(tmp_path / "input.wav")
    WaveAudio.from_pcm(path, make_reader())
    return path


@pytest.fixture()
def flac_file(tmp_path):
    path = str(tmp_path / "input.flac")
    FlacAudio.from_pcm(path, make_reader(), compression="5")
    return path


# ------------------------------------------------------ bad inputs --

@pytest.mark.parametrize("tool", [
    "track2track", "trackverify", "trackcat", "trackcmp",
    "tracktag", "trackrename", "coverdump",
])
def test_missing_input_file_fails(tool, tmp_path):
    r = run_tool(tool, str(tmp_path / "nope.flac"))
    assert r.returncode != 0
    assert (r.stderr + r.stdout).strip() != ""


@pytest.mark.parametrize("tool", ["trackinfo", "tracklength",
                                  "tracklint"])
def test_missing_input_file_warns(tool, tmp_path):
    """display/lint tools follow the reference's open_files
    convention: warn about unopenable inputs and continue"""
    r = run_tool(tool, str(tmp_path / "nope.flac"))
    assert (r.stderr + r.stdout).strip() != ""


@pytest.mark.parametrize("tool", ["track2track", "trackverify"])
def test_garbage_file_fails(tool, tmp_path):
    bad = tmp_path / "garbage.flac"
    bad.write_bytes(b"\x00\x01\x02 not audio " * 100)
    r = run_tool(tool, str(bad))
    assert r.returncode != 0


def test_garbage_file_warns_trackinfo(tmp_path):
    bad = tmp_path / "garbage.flac"
    bad.write_bytes(b"\x00\x01\x02 not audio " * 100)
    r = run_tool("trackinfo", str(bad))
    assert (r.stderr + r.stdout).strip() != ""


def test_track2track_unknown_type(wav_file):
    r = run_tool("track2track", "-t", "nosuch", wav_file)
    assert r.returncode != 0


def test_track2track_bad_quality(wav_file, tmp_path):
    r = run_tool("track2track", "-t", "flac", "-q", "99",
                 "-d", str(tmp_path / "out"), wav_file)
    assert r.returncode != 0


def test_track2track_no_args():
    r = run_tool("track2track")
    assert r.returncode != 0


def test_truncated_flac_verify_fails(flac_file, tmp_path):
    data = open(flac_file, "rb").read()
    cut = tmp_path / "cut.flac"
    cut.write_bytes(data[:len(data) // 2])
    r = run_tool("trackverify", str(cut))
    assert r.returncode != 0


def test_trackcmp_mismatched_counts(wav_file, tmp_path):
    r = run_tool("trackcmp", wav_file, str(tmp_path))
    assert r.returncode != 0


def test_tracksplit_requires_cuesheet(flac_file, tmp_path):
    r = run_tool("tracksplit", "-d", str(tmp_path / "parts"),
                 flac_file)
    assert r.returncode != 0


# --------------------------------------------- transcode matrix ----

LOSSLESS_TYPES = ["flac", "wavpack", "tta", "shn", "alac", "aiff",
                  "wav", "au"]


@pytest.mark.parametrize("fmt", LOSSLESS_TYPES)
def test_cli_transcode_roundtrip(fmt, wav_file, tmp_path):
    """wav -> fmt -> compare byte-exact PCM via trackcmp"""
    out_dir = tmp_path / ("out_" + fmt)
    r = run_tool("track2track", "-t", fmt, "-d", str(out_dir),
                 wav_file)
    assert r.returncode == 0, r.stderr
    outs = os.listdir(str(out_dir))
    assert len(outs) == 1
    produced = str(out_dir / outs[0])
    r2 = run_tool("trackcmp", wav_file, produced)
    assert r2.returncode == 0, r2.stdout + r2.stderr


def test_track2track_preserves_metadata(flac_file, tmp_path):
    r = run_tool("tracktag", "--name", "My Song", "--artist",
                 "Someone", flac_file)
    assert r.returncode == 0, r.stderr
    out_dir = tmp_path / "conv"
    r = run_tool("track2track", "-t", "wavpack", "-d", str(out_dir),
                 flac_file)
    assert r.returncode == 0, r.stderr
    produced = str(out_dir / os.listdir(str(out_dir))[0])
    info = run_tool("trackinfo", produced)
    assert "My Song" in info.stdout
    assert "Someone" in info.stdout


def test_tracklength_sums_multiple(wav_file, flac_file):
    r = run_tool("tracklength", wav_file, flac_file)
    assert r.returncode == 0
    assert ":" in r.stdout


def test_trackrename_template(flac_file, tmp_path):
    r = run_tool("tracktag", "--name", "Named", "--number", "7",
                 flac_file)
    assert r.returncode == 0, r.stderr
    r = run_tool("trackrename",
                 "--format", "%(track_number)2.2d - %(track_name)s.%(suffix)s",
                 flac_file)
    assert r.returncode == 0, r.stderr
    parent = os.path.dirname(flac_file)
    assert "07 - Named.flac" in os.listdir(parent)


def test_tracktag_replace_and_remove(flac_file):
    assert run_tool("tracktag", "--name", "First",
                    flac_file).returncode == 0
    assert "First" in run_tool("trackinfo", flac_file).stdout
    assert run_tool("tracktag", "--name", "Second",
                    flac_file).returncode == 0
    out = run_tool("trackinfo", flac_file).stdout
    assert "Second" in out and "First" not in out


def test_output_into_file_path_fails(wav_file, tmp_path):
    """-d pointing under an existing FILE cannot be created"""
    blocker = tmp_path / "blocker"
    blocker.write_bytes(b"x")
    r = run_tool("track2track", "-t", "flac",
                 "-d", str(blocker / "sub"), wav_file)
    assert r.returncode != 0
