"""CD image (cue/bin) stack tests: CDImage sector API, CDTrackReader,
disc IDs, and the cd2track/cdinfo CLI tools (the image backend is how
the reference tests CD logic without hardware, test_core.py:462)."""

import os
import sys

import numpy as np
import pytest

from audiotools_tpu.cdio import (CDImage, CDDA, CDTrackReader,
                                 SECTOR_FRAMES)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SR = 44100


def make_image(tmp_path, seconds=8):
    n = seconds * SR        # whole seconds are sector-aligned
    t = np.arange(n)
    arr = np.clip(np.stack([8000 * np.sin(2 * np.pi * 440 * t / SR),
                            7000 * np.sin(2 * np.pi * 550 * t / SR)],
                           axis=1), -32768, 32767).astype(np.int16)
    bin_path = str(tmp_path / "disc.bin")
    open(bin_path, "wb").write(arr.astype("<i2").tobytes())
    cue_path = str(tmp_path / "disc.cue")
    open(cue_path, "w").write(
        'FILE "disc.bin" BINARY\n'
        '  TRACK 01 AUDIO\n    INDEX 01 00:00:00\n'
        '  TRACK 02 AUDIO\n    INDEX 01 00:05:00\n')
    return (cue_path, arr.astype(np.int32))


def test_cdimage_sector_api(tmp_path):
    (cue, arr) = make_image(tmp_path)
    image = CDImage(cue)
    assert image.total_tracks() == 2
    assert image.track_offsets(1) == 0
    assert image.track_offsets(2) == 5 * 75
    assert image.track_lengths(1) == 5 * 75
    assert image.first_sector() == 0
    image.seek(1)
    sector = image.read_sector()
    assert len(sector) == 2352
    got = np.frombuffer(sector, dtype="<i2").reshape(-1, 2)
    assert np.array_equal(got, arr[SECTOR_FRAMES:2 * SECTOR_FRAMES])
    image.close()


def test_cdtrackreader_matches_source(tmp_path):
    (cue, arr) = make_image(tmp_path)
    cdda = CDDA(cue)
    assert len(cdda) == 2
    for (number, start, length) in ((1, 0, 5 * SR), (2, 5 * SR, 3 * SR)):
        reader = cdda[number]
        out = []
        fl = reader.read(65536)
        while fl.frames:
            out.append(fl.samples)
            fl = reader.read(65536)
        got = np.concatenate(out)
        assert got.shape[0] == length
        assert np.array_equal(got, arr[start:start + length]), number
    cdda.close()


def test_cdtrackreader_sample_offset(tmp_path):
    (cue, arr) = make_image(tmp_path)
    cdda = CDDA(cue)
    reader = CDTrackReader(cdda.cdda, 2, sample_offset=10)
    fl = reader.read(100)
    assert np.array_equal(fl.samples,
                          arr[5 * SR + 10:5 * SR + 110])
    # negative offset pads with silence before the disc start
    reader2 = CDTrackReader(cdda.cdda, 1, sample_offset=-5)
    fl2 = reader2.read(10)
    assert np.array_equal(fl2.samples[:5], np.zeros((5, 2), np.int32))
    assert np.array_equal(fl2.samples[5:], arr[0:5])
    cdda.close()


def test_disc_ids(tmp_path):
    (cue, _arr) = make_image(tmp_path)
    cdda = CDDA(cue)
    freedb = cdda.freedb_disc_id()
    assert str(freedb) == "%8.8X" % (int(freedb),)
    assert int(freedb) & 0xFF == 2          # track count
    ar = cdda.accuraterip_disc_id()
    name = str(ar)
    assert name.startswith("dBAR-002-")
    assert name.endswith(".bin")
    mb = str(cdda.musicbrainz_disc_id())
    assert len(mb) == 28
    assert "=" not in mb
    cdda.close()


from cli_harness import run_tool  # noqa: E402


def test_cdinfo_cli(tmp_path):
    (cue, _arr) = make_image(tmp_path)
    r = run_tool("cdinfo", "-c", cue)
    assert r.returncode == 0, r.stderr
    assert "Tracks : 2" in r.stdout
    assert "dBAR-002-" in r.stdout


def test_cd2track_cli(tmp_path):
    from audiotools_tpu.formats.flac import FlacAudio
    (cue, arr) = make_image(tmp_path)
    outdir = str(tmp_path / "rip")
    r = run_tool("cd2track", "-c", cue, "-t", "flac", "-q", "5",
                 "-d", outdir)
    assert r.returncode == 0, r.stderr
    files = sorted(os.listdir(outdir))
    assert len(files) == 2
    # rip must be bit-exact against the image
    track1 = FlacAudio(os.path.join(outdir, files[0]))
    dec = track1.to_pcm()
    out = []
    fl = dec.read(65536)
    while fl.frames:
        out.append(fl.samples)
        fl = dec.read(65536)
    dec.close()
    assert np.array_equal(np.concatenate(out), arr[:5 * SR])
    # bad image path errors
    assert run_tool("cd2track", "-c",
                    str(tmp_path / "none.cue")).returncode != 0


def test_metadata_lookup_parsers():
    """XMCD and MusicBrainz XML responses parse into MetaData"""
    from audiotools_tpu.services.lookup import (parse_xmcd,
                                                parse_musicbrainz_xml,
                                                metadata_lookup)
    xmcd = ("# xmcd\n#\nDISCID=09000702\n"
            "DTITLE=Some Artist / Some Album\nDYEAR=1999\n"
            "TTITLE0=First Track\nTTITLE1=Second Track\n"
            "EXTD=\nPLAYORDER=\n")
    parsed = parse_xmcd(xmcd, 2)
    assert parsed[0].track_name == "First Track"
    assert parsed[0].artist_name == "Some Artist"
    assert parsed[0].album_name == "Some Album"
    assert parsed[1].track_number == 2
    assert parsed[1].year == "1999"

    mb = ('<metadata xmlns="http://musicbrainz.org/ns/mmd-2.0#">'
          '<disc><release-list><release><title>An Album</title>'
          '<date>2001-05-01</date>'
          '<artist-credit><name-credit><artist>'
          '<name>An Artist</name></artist></name-credit>'
          '</artist-credit>'
          '<medium-list><medium><track-list>'
          '<track><recording><title>T1</title></recording></track>'
          '<track><recording><title>T2</title></recording></track>'
          '</track-list></medium></medium-list>'
          '</release></release-list></disc></metadata>')
    choices = parse_musicbrainz_xml(mb, 2)
    assert len(choices) == 1
    assert choices[0][0].track_name == "T1"
    assert choices[0][0].album_name == "An Album"
    assert choices[0][0].artist_name == "An Artist"
    assert choices[0][1].year == "2001"


def test_metadata_lookup_offline(tmp_path):
    """offline lookups degrade to the blank default choice"""
    from audiotools_tpu.services.lookup import metadata_lookup
    (cue, _arr) = make_image(tmp_path)
    cdda = CDDA(cue)
    choices = metadata_lookup(
        cdda, musicbrainz_server="localhost.invalid",
        freedb_server="localhost.invalid")
    assert len(choices) >= 1
    default = choices[-1]
    assert len(default) == 2
    assert default[0].track_number == 1
    assert default[1].track_number == 2
    cdda.close()


def make_nrg(tmp_path, seconds=8):
    """builds a v2 (NER5) NRG image: raw audio sectors followed by a
    CUEX + DAOX + SINF + END! chunk area and the 12-byte footer"""
    n = seconds * SR
    t = np.arange(n)
    arr = np.clip(np.stack([8000 * np.sin(2 * np.pi * 440 * t / SR),
                            7000 * np.sin(2 * np.pi * 550 * t / SR)],
                           axis=1), -32768, 32767).astype(np.int16)
    audio = arr.astype("<i2").tobytes()
    total_sectors = len(audio) // 2352
    track_starts = [0, 5 * 75]      # sectors
    track_ends = track_starts[1:] + [total_sectors]

    def chunk(cid, payload):
        return cid + len(payload).to_bytes(4, "big") + payload

    def bcd(v):
        return ((v // 10) << 4) | (v % 10)

    cuex = b""
    for (i, start) in enumerate(track_starts, 1):
        cuex += bytes([0x01, bcd(i), 0x00, 0x00]) + \
            start.to_bytes(4, "big", signed=True)
        cuex += bytes([0x01, bcd(i), 0x01, 0x00]) + \
            start.to_bytes(4, "big", signed=True)
    cuex += bytes([0x01, 0xAA, 0x01, 0x00]) + \
        total_sectors.to_bytes(4, "big", signed=True)

    daox = (b"\x00" * 4 + b"\x00" * 13 + b"\x00" +
            (0x0600).to_bytes(2, "big") + bytes([1, 2]))
    for (start, end) in zip(track_starts, track_ends):
        daox += (b"\x00" * 12 +                      # ISRC
                 (2352).to_bytes(2, "big") +         # sector size
                 (0x0700).to_bytes(2, "big") +       # mode: audio
                 b"\x00" * 2 +
                 (start * 2352).to_bytes(8, "big") +  # index0
                 (start * 2352).to_bytes(8, "big") +  # index1
                 (end * 2352).to_bytes(8, "big"))     # track end

    chunks = (chunk(b"CUEX", cuex) + chunk(b"DAOX", daox) +
              chunk(b"SINF", (2).to_bytes(4, "big")) +
              chunk(b"END!", b""))
    nrg_path = str(tmp_path / "disc.nrg")
    with open(nrg_path, "wb") as f:
        f.write(audio)
        chunk_offset = f.tell()
        f.write(chunks)
        f.write(b"NER5" + chunk_offset.to_bytes(8, "big"))
    return (nrg_path, arr.astype(np.int32))


def test_nrg_image_sector_api(tmp_path):
    from audiotools_tpu.cdio import NRGImage
    (nrg, arr) = make_nrg(tmp_path)
    image = NRGImage(nrg)
    assert image.total_tracks() == 2
    assert image.track_offsets(1) == 0
    assert image.track_offsets(2) == 5 * 75
    assert image.track_lengths(1) == 5 * 75
    assert image.track_lengths(2) == 3 * 75
    image.seek(1)
    sector = image.read_sector()
    assert len(sector) == 2352
    got = np.frombuffer(sector, dtype="<i2").reshape(-1, 2)
    assert np.array_equal(got, arr[SECTOR_FRAMES:2 * SECTOR_FRAMES])
    image.close()


def test_nrg_matches_cue_equivalent(tmp_path):
    """the same disc as cue/bin and as NRG decodes identically and
    carries the same disc IDs"""
    (cue, _arr) = make_image(tmp_path)
    (nrg, _arr2) = make_nrg(tmp_path)
    cdda_cue = CDDA(cue)
    cdda_nrg = CDDA(nrg)
    assert len(cdda_cue) == len(cdda_nrg)
    assert cdda_cue.track_offsets() == cdda_nrg.track_offsets()
    assert (str(cdda_cue.freedb_disc_id()) ==
            str(cdda_nrg.freedb_disc_id()))
    assert (str(cdda_cue.accuraterip_disc_id()) ==
            str(cdda_nrg.accuraterip_disc_id()))
    for number in (1, 2):
        def drain_track(reader):
            out = []
            fl = reader.read(1 << 16)
            while fl.frames:
                out.append(fl.samples)
                fl = reader.read(1 << 16)
            return np.concatenate(out)
        assert np.array_equal(drain_track(cdda_cue[number]),
                              drain_track(cdda_nrg[number]))
    cdda_cue.close()
    cdda_nrg.close()


def test_nrg_sniffed_without_extension(tmp_path):
    """identify_cdrom detects the NER5 footer regardless of suffix"""
    from audiotools_tpu.cdio import identify_cdrom, NRGImage
    (nrg, _arr) = make_nrg(tmp_path)
    renamed = str(tmp_path / "disc.image")
    os.rename(nrg, renamed)
    image = identify_cdrom(renamed)
    assert isinstance(image, NRGImage)
    image.close()


def test_cd2track_reads_nrg(tmp_path):
    """the cd2track CLI accepts an NRG image"""
    import subprocess
    (nrg, arr) = make_nrg(tmp_path)
    out_dir = str(tmp_path / "out")
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.setdefault("ATPU_FLAC_BACKEND", "numpy")
    env.setdefault("JAX_PLATFORMS", "cpu")
    result = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "cd2track"),
         "-c", nrg, "-t", "wav", "-d", out_dir, "1"],
        capture_output=True, text=True, env=env, timeout=300)
    assert result.returncode == 0, result.stderr[-1000:]
    from audiotools_tpu.formats.wav import WaveAudio
    wavs = sorted(os.listdir(out_dir))
    assert len(wavs) == 1
    track = WaveAudio(os.path.join(out_dir, wavs[0]))
    assert track.total_frames() == 5 * SR
