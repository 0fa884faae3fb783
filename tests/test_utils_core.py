"""Core utility tests: TemporaryFile atomic rewrites, Filename
device/inode dedup, Messenger channels, output_table alignment and
the layered config system (reference __init__.py:317-1264, 1553,
5551 and the audiotools.cfg machinery)."""

import io
import os

import pytest

from audiotools_tpu.utils.files import TemporaryFile, make_dirs
from audiotools_tpu.utils.messenger import (Messenger,
                                            SilentMessenger,
                                            output_table)
from audiotools_tpu.dispatch import Filename


# ---------------------------------------------- TemporaryFile ------

def test_temporary_file_atomic_replace(tmp_path):
    target = tmp_path / "x.bin"
    target.write_bytes(b"old contents")
    t = TemporaryFile(str(target))
    t.write(b"new contents")
    # until close, the original is untouched
    assert target.read_bytes() == b"old contents"
    t.close()
    assert target.read_bytes() == b"new contents"


def test_temporary_file_preserves_mode(tmp_path):
    target = tmp_path / "y.bin"
    target.write_bytes(b"data")
    os.chmod(str(target), 0o640)
    t = TemporaryFile(str(target))
    t.write(b"other")
    t.close()
    assert (os.stat(str(target)).st_mode & 0o777) == 0o640


def test_temporary_file_abandoned_cleanup(tmp_path):
    target = tmp_path / "z.bin"
    target.write_bytes(b"keep me")
    t = TemporaryFile(str(target))
    t.write(b"never committed")
    temp_name = t.__temp_filename__
    del t                                  # abandoned, not closed
    assert target.read_bytes() == b"keep me"
    assert not os.path.exists(temp_name)


def test_make_dirs_nested(tmp_path):
    p = str(tmp_path / "a" / "b" / "c")
    make_dirs(os.path.join(p, "file.flac"))
    assert os.path.isdir(p)


# --------------------------------------------------- Filename ------

def test_filename_dedup_same_inode(tmp_path):
    f = tmp_path / "orig.flac"
    f.write_bytes(b"x")
    link = tmp_path / "hardlink.flac"
    os.link(str(f), str(link))
    a = Filename(str(f))
    b = Filename(str(link))
    assert a == b                          # same device+inode
    assert len({a, b}) == 1


def test_filename_distinct_files_differ(tmp_path):
    f1 = tmp_path / "one.flac"
    f2 = tmp_path / "two.flac"
    f1.write_bytes(b"1")
    f2.write_bytes(b"2")
    assert Filename(str(f1)) != Filename(str(f2))


def test_filename_missing_file_compares_by_path(tmp_path):
    a = Filename(str(tmp_path / "ghost.flac"))
    b = Filename(str(tmp_path / "ghost.flac"))
    c = Filename(str(tmp_path / "other.flac"))
    assert a == b
    assert a != c


# -------------------------------------------------- Messenger ------

def test_messenger_channels(capsys):
    m = Messenger("tool")
    m.output(u"to stdout")
    m.info(u"info line")
    m.error(u"bad thing")
    m.warning(u"careful")
    captured = capsys.readouterr()
    assert "to stdout" in captured.out
    assert "*** Error: bad thing" in captured.err
    assert "*** Warning: careful" in captured.err
    assert "info line" in captured.err


def test_messenger_verbosity_quiet(capsys):
    class Opts:
        verbosity = "quiet"
    m = Messenger("tool", Opts())
    m.info(u"hidden")
    m.output(u"still shown")
    captured = capsys.readouterr()
    assert "hidden" not in captured.err
    assert "still shown" in captured.out


def test_silent_messenger_swallows_output():
    m = SilentMessenger("tool")
    m.output(u"nothing")
    m.info(u"nothing")
    m.warning(u"nothing")


def test_output_table_alignment():
    table = output_table()
    row = table.row()
    row.add_column(u"a")
    row.add_column(u"long-header", "right")
    row = table.row()
    row.add_column(u"bb")
    row.add_column(u"x", "right")
    lines = list(table.format())
    assert len(lines) == 2
    # right-aligned column lines up at the right edge
    assert lines[0].endswith("long-header")
    assert lines[1].endswith("x")
    assert len(lines[0]) == len(lines[1])
