"""Black-box tests for the cover-art and playback CLI tools
(covertag/coverdump round trip; trackplay over the NULL output)."""

import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PNG = bytes.fromhex(
    "89504e470d0a1a0a0000000d49484452000000010000000108020000009077"
    "53de0000000c4944415408d763f8cfc000000301010018dd8db00000000049"
    "454e44ae426082")


from cli_harness import run_tool  # noqa: E402


@pytest.fixture()
def flac_file(tmp_path):
    from audiotools_tpu.formats.flac import FlacAudio
    from audiotools_tpu import pcm
    SR = 44100
    n = SR // 4
    sig = (6000 * np.sin(2 * np.pi * 441 *
                         np.arange(n) / SR)).astype(np.int32)
    arr = np.stack([sig, sig >> 1], 1).astype(np.int32)

    class Raw:
        sample_rate = SR
        channels = 2
        channel_mask = 3
        bits_per_sample = 16

        def __init__(self):
            self.pos = 0

        def read(self, f):
            chunk = arr[self.pos:self.pos + f]
            self.pos += len(chunk)
            return pcm.FrameList._wrap(
                np.ascontiguousarray(chunk), 16)

        def close(self):
            pass

    path = str(tmp_path / "t.flac")
    FlacAudio.from_pcm(path, Raw())
    return path


def test_covertag_coverdump_roundtrip(tmp_path, flac_file):
    png_path = str(tmp_path / "cover.png")
    with open(png_path, "wb") as f:
        f.write(PNG)

    r = run_tool("covertag", "--front-cover", png_path, flac_file)
    assert r.returncode == 0, r.stderr

    outdir = str(tmp_path / "dump")
    os.makedirs(outdir)
    r = run_tool("coverdump", "-d", outdir, flac_file)
    assert r.returncode == 0, r.stderr
    dumped = sorted(os.listdir(outdir))
    assert len(dumped) == 1
    with open(os.path.join(outdir, dumped[0]), "rb") as f:
        assert f.read() == PNG


def test_covertag_remove_images(tmp_path, flac_file):
    png_path = str(tmp_path / "cover.png")
    with open(png_path, "wb") as f:
        f.write(PNG)
    assert run_tool("covertag", "--front-cover", png_path,
                    flac_file).returncode == 0
    assert run_tool("covertag", "--remove-images",
                    flac_file).returncode == 0
    outdir = str(tmp_path / "dump")
    os.makedirs(outdir)
    r = run_tool("coverdump", "-d", outdir, flac_file)
    assert os.listdir(outdir) == []


def test_coverdump_no_images(tmp_path, flac_file):
    outdir = str(tmp_path / "dump")
    os.makedirs(outdir)
    r = run_tool("coverdump", "-d", outdir, flac_file)
    assert r.returncode == 1
    assert "no images found" in r.stderr
    assert os.listdir(outdir) == []


def test_trackplay_null_output(flac_file):
    """trackplay -o NULL plays the track to the discarding sink"""
    r = run_tool("trackplay", "-o", "NULL", flac_file)
    assert r.returncode == 0, r.stderr


def test_trackplay_missing_file(tmp_path):
    r = run_tool("trackplay", "-o", "NULL",
                 str(tmp_path / "missing.flac"))
    assert r.returncode != 0


def test_track2cd_without_burner(tmp_path, flac_file):
    """track2cd fails cleanly when no burner binaries exist"""
    r = run_tool("track2cd", flac_file)
    assert r.returncode != 0
    assert ("cdrdao" in (r.stderr + r.stdout) or
            "cdrecord" in (r.stderr + r.stdout) or
            "Error" in (r.stderr + r.stdout))
