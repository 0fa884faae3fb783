"""Cue/TOC sheet parsing, writing and Sheet-object algebra.

Mirrors the reference's sheet coverage (test/test_core.py:4427-4824):
parse -> object -> write -> reparse round trips for both formats,
cross-format equivalence (the same album layout read from .cue and
.toc compares equal), timestamp arithmetic, pre-gap (index 0)
handling, ISRC/catalog carriage, pcm_lengths splitting, and error
cases for malformed inputs.
"""

import os

import pytest
from fractions import Fraction as F

from audiotools_tpu.audiofile import Sheet, SheetTrack, SheetIndex
from audiotools_tpu.sheets import cue, toc
from audiotools_tpu.sheets.cue import (read_cuesheet_string,
                                       write_cuesheet, CueException)
from audiotools_tpu.sheets.toc import (read_tocfile_string,
                                       write_tocfile, TOCException)

THREE_TRACK_CUE = """REM COMMENT "test album"
CATALOG 1234567890123
FILE "album.wav" WAVE
  TRACK 01 AUDIO
    ISRC USPR30800001
    INDEX 01 00:00:00
  TRACK 02 AUDIO
    INDEX 00 02:58:65
    INDEX 01 03:00:00
  TRACK 03 AUDIO
    INDEX 01 06:30:40
"""

THREE_TRACK_TOC = """CD_DA

CATALOG "1234567890123"

TRACK AUDIO
ISRC "USPR30800001"
AUDIOFILE "album.wav" 00:00:00 03:00:00

TRACK AUDIO
AUDIOFILE "album.wav" 03:00:00 03:30:40

TRACK AUDIO
AUDIOFILE "album.wav" 06:30:40
"""


def test_cue_parses_structure():
    sheet = read_cuesheet_string(THREE_TRACK_CUE)
    assert len(sheet) == 3
    assert sheet.catalog() == "1234567890123"
    assert sheet.track(1).ISRC() == "USPR30800001"
    assert sheet.track(1).index(1).offset() == 0
    # 03:00:00 = 180 seconds
    assert sheet.track(2).index(1).offset() == 180
    # pre-gap index 0 at 02:58:65 (offsets are exact Fractions)
    assert sheet.track(2).index(0).offset() == F(178 * 75 + 65, 75)
    assert sheet.track(3).index(1).offset() == \
        F((6 * 60 + 30) * 75 + 40, 75)


def test_cue_write_reparse_roundtrip(tmp_path):
    sheet = read_cuesheet_string(THREE_TRACK_CUE)
    path = str(tmp_path / "out.cue")
    with open(path, "w") as f:
        write_cuesheet(sheet, "album.wav", f)
    reparsed = cue.read_cuesheet(path)
    assert reparsed == sheet


def test_toc_parses_structure():
    sheet = read_tocfile_string(THREE_TRACK_TOC)
    assert len(sheet) == 3
    assert sheet.catalog() == "1234567890123"
    assert sheet.track(1).ISRC() == "USPR30800001"
    assert sheet.track(2).index(1).offset() == 180


def test_toc_write_reparse_roundtrip(tmp_path):
    sheet = read_tocfile_string(THREE_TRACK_TOC)
    path = str(tmp_path / "out.toc")
    with open(path, "w") as f:
        write_tocfile(sheet, "album.wav", f)
    reparsed = toc.read_tocfile(path)
    assert len(reparsed) == len(sheet)
    for (a, b) in zip(sheet.tracks(), reparsed.tracks()):
        assert a.index(1).offset() == b.index(1).offset()


def test_cue_and_toc_equivalent_layout():
    """the same album described both ways yields matching offsets"""
    from_cue = read_cuesheet_string(THREE_TRACK_CUE)
    from_toc = read_tocfile_string(THREE_TRACK_TOC)
    assert len(from_cue) == len(from_toc)
    for (c, t) in zip(from_cue.tracks(), from_toc.tracks()):
        assert c.number() == t.number()
        assert c.index(1).offset() == t.index(1).offset()


def test_pcm_lengths_sum_to_total():
    sheet = read_cuesheet_string(THREE_TRACK_CUE)
    total = 44100 * 60 * 10
    lengths = list(sheet.pcm_lengths(total, 44100))
    assert len(lengths) == 3
    assert sum(lengths) == total
    assert lengths[0] == 180 * 44100


def test_image_formatted():
    sheet = read_cuesheet_string(THREE_TRACK_CUE)
    assert sheet.image_formatted()


def test_sheet_equality_and_track_lookup():
    a = read_cuesheet_string(THREE_TRACK_CUE)
    b = read_cuesheet_string(THREE_TRACK_CUE)
    assert a == b
    with pytest.raises(KeyError):
        a.track(9)
    with pytest.raises(KeyError):
        a.track(1).index(9)


@pytest.mark.parametrize("bad", [
    "",                                   # empty
    "FILE missing-quote.wav WAVE\nTRACK",  # malformed track
    "TRACK 01 AUDIO\n  INDEX 01 xx:yy:zz\n",  # bad timestamp
])
def test_cue_malformed_raises(bad):
    with pytest.raises(Exception):
        sheet = read_cuesheet_string(bad)
        # parsers may defer validation to access
        list(sheet.tracks()) and sheet.track(1).index(1).offset()


def test_toc_malformed_raises():
    with pytest.raises(Exception):
        sheet = read_tocfile_string("not a toc file at all")
        list(sheet.tracks()) and sheet.track(1)


def test_sheet_objects_constructed_directly():
    sheet = Sheet([SheetTrack(1, [SheetIndex(1, 0)]),
                   SheetTrack(2, [SheetIndex(0, 170),
                                  SheetIndex(1, 172)])],
                  catalog_number="9999999999999")
    assert len(sheet) == 2
    assert sheet.track(2).index(0).offset() == 170
    lengths = list(sheet.pcm_lengths(44100 * 200, 44100))
    assert lengths[0] == 172 * 44100
    assert sum(lengths) == 44100 * 200
