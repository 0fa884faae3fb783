#!/usr/bin/env python
"""Generates man pages for every CLI tool from its own --help output.

The reference ships hand-written XML man-page sources
(``/root/reference/docs/*.xml``, 22 files); this repo generates the
equivalent section-1 pages from each tool's live argparse definition
instead, so the documentation can never drift from the implemented
flags.  Output: ``docs/man/<tool>.1`` (roff) — render with
``man -l docs/man/track2track.1``.

Run: JAX_PLATFORMS=cpu python tools_dev/gen_manpages.py
"""

import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOLS = os.path.join(REPO, "tools")
OUT = os.path.join(REPO, "docs", "man")

# one-line descriptions (role of the reference's <name> fields)
DESCRIPTIONS = {
    "track2track": "convert audio tracks between formats",
    "track2cd": "burn audio tracks to CD-R",
    "trackcat": "concatenate audio tracks into one file",
    "trackcmp": "compare audio tracks for PCM equality",
    "trackinfo": "display audio track metadata and technical info",
    "tracklength": "display the total length of audio tracks",
    "tracklint": "check and fix audio metadata problems",
    "trackplay": "play audio tracks in the terminal",
    "trackrename": "rename audio tracks from their metadata",
    "tracksplit": "split an audio image by cuesheet",
    "tracktag": "update audio track metadata",
    "trackverify": "verify the integrity of audio tracks",
    "cd2track": "rip CD audio to track files",
    "cdinfo": "display audio CD information",
    "cdplay": "play audio CDs in the terminal",
    "dvda2track": "rip DVD-Audio titles to track files",
    "dvdainfo": "display DVD-Audio disc information",
    "coverdump": "extract embedded cover art from tracks",
    "covertag": "embed cover art into tracks",
    "coverview": "display embedded cover art",
    "audiotools-config": "show and edit audiotools settings",
}


def _esc(text):
    return text.replace("\\", "\\\\").replace("-", "\\-")


def roff_from_help(tool, help_text, description):
    lines = help_text.splitlines()
    usage = []
    i = 0
    while i < len(lines) and (lines[i].startswith("usage:") or
                              (usage and lines[i].startswith(" "))):
        usage.append(lines[i].replace("usage:", "").strip())
        i += 1
    synopsis = " ".join(u for u in usage if u) or tool

    out = [
        '.TH %s 1 "" "audiotools_tpu" "User Commands"'
        % tool.upper().replace("-", "\\-"),
        ".SH NAME",
        "%s \\- %s" % (_esc(tool), _esc(description)),
        ".SH SYNOPSIS",
        ".B %s" % _esc(synopsis.split(" ", 1)[0]),
        (".RI %s" % _esc(synopsis.split(" ", 1)[1])
         if " " in synopsis else ""),
        ".SH DESCRIPTION",
        _esc(description[0].upper() + description[1:]) + ".",
        ".SH OPTIONS",
    ]
    body = lines[i:]
    in_opts = False
    for line in body:
        s = line.strip()
        if not s:
            continue
        if re.match(r"^(positional arguments|options|optional "
                    r"arguments)", s, re.I):
            in_opts = True
            out.append(".SS %s" % _esc(s.rstrip(":")))
            continue
        if re.match(r"^[A-Za-z ]+:$", s) and not s.startswith("-"):
            out.append(".SS %s" % _esc(s.rstrip(":")))
            continue
        if s.startswith("-") or (not in_opts):
            # "-x ARG, --xxx ARG   help text" -> .TP block
            m = re.match(r"^(-{1,2}[^\s].*?)(\s{2,}(.*))?$", s)
            if m and s.startswith("-"):
                out.append(".TP")
                out.append("\\fB%s\\fR" % _esc(m.group(1)))
                if m.group(3):
                    out.append(_esc(m.group(3)))
                continue
        out.append(_esc(s))
    out.append(".SH SEE ALSO")
    others = sorted(t for t in DESCRIPTIONS if t != tool)[:6]
    out.append(", ".join("%s(1)" % _esc(t) for t in others))
    return "\n".join(o for o in out if o is not None) + "\n"


def main():
    os.makedirs(OUT, exist_ok=True)
    env = dict(os.environ)
    env.setdefault("JAX_PLATFORMS", "cpu")
    written = []
    for tool in sorted(os.listdir(TOOLS)):
        path = os.path.join(TOOLS, tool)
        if not os.path.isfile(path) or "." in tool:
            continue            # CLI shims only (skip dev scripts)
        try:
            res = subprocess.run(
                [sys.executable, path, "--help"], env=env,
                capture_output=True, text=True, timeout=120)
        except subprocess.TimeoutExpired:
            print("TIMEOUT %s" % tool, file=sys.stderr)
            continue
        text = res.stdout or res.stderr
        if not text.strip():
            print("NO HELP %s" % tool, file=sys.stderr)
            continue
        desc = DESCRIPTIONS.get(tool, "audio tool")
        page = roff_from_help(tool, text, desc)
        with open(os.path.join(OUT, tool + ".1"), "w") as f:
            f.write(page)
        written.append(tool)
    print("wrote %d man pages: %s" % (len(written),
                                      " ".join(written)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
