"""The generated man pages (docs/man) must exist for every CLI tool
and carry the standard sections — the reference ships a man page per
tool (reference docs/*.xml, 22 sources)."""

import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MAN = os.path.join(REPO, "docs", "man")

TOOLS = [
    "track2track", "track2cd", "trackcat", "trackcmp", "trackinfo",
    "tracklength", "tracklint", "trackplay", "trackrename",
    "tracksplit", "tracktag", "trackverify", "cd2track", "cdinfo",
    "cdplay", "dvda2track", "dvdainfo", "coverdump", "covertag",
    "coverview", "audiotools-config",
]


@pytest.mark.parametrize("tool", TOOLS)
def test_man_page_exists_with_sections(tool):
    path = os.path.join(MAN, tool + ".1")
    assert os.path.exists(path), "missing man page for %s" % tool
    with open(path) as f:
        text = f.read()
    for section in (".TH ", ".SH NAME", ".SH SYNOPSIS",
                    ".SH DESCRIPTION", ".SH OPTIONS"):
        assert section in text, (tool, section)
