"""audiotools-config: display and edit configuration.

Rebuild of the reference ``audiotools-config`` tool: shows the format
availability table and current defaults from ~/.audiotools.cfg.
"""

from __future__ import annotations

import argparse
import sys

from . import add_common_arguments
from ..utils.messenger import Messenger, output_table
from ..text import (DESC_CONFIG, ERR_UNSUPPORTED_AUDIO_TYPE,
                    LAB_CONFIG_SYSTEM, LAB_CONFIG_DEFAULT_TYPE,
                    LAB_CONFIG_MAX_JOBS, LAB_CONFIG_FORMATS,
                    LAB_CONFIG_QUALITY, LAB_CONFIG_QUALITY_DEFAULT,
                    LAB_CONFIG_SET, HELP_CONFIG_TYPE)


def main(argv=None):
    parser = argparse.ArgumentParser(
        prog="audiotools-config",
        description=DESC_CONFIG)
    add_common_arguments(parser)
    parser.add_argument("-t", "--type", dest="default_type",
                        default=None,
                        help=HELP_CONFIG_TYPE)
    # persisted settings (reference audiotools-config:290-380): every
    # flag below writes one ~/.audiotools.cfg key
    parser.add_argument("-q", "--quality", dest="quality",
                        default=None)
    parser.add_argument("--format", dest="filename_format",
                        default=None)
    parser.add_argument("-j", "--joint", dest="maximum_jobs",
                        type=int, default=None)
    parser.add_argument("--replay-gain", dest="add_replaygain",
                        choices=("yes", "no"), default=None)
    parser.add_argument("--use-musicbrainz", dest="use_musicbrainz",
                        choices=("yes", "no"), default=None)
    parser.add_argument("--musicbrainz-server",
                        dest="musicbrainz_server", default=None)
    parser.add_argument("--musicbrainz-port", type=int,
                        dest="musicbrainz_port", default=None)
    parser.add_argument("--use-freedb", dest="use_freedb",
                        choices=("yes", "no"), default=None)
    parser.add_argument("--freedb-server", dest="freedb_server",
                        default=None)
    parser.add_argument("--freedb-port", type=int,
                        dest="freedb_port", default=None)
    parser.add_argument("--cdrom", dest="system_cdrom", default=None)
    parser.add_argument("--cdrom-read-offset", type=int,
                        dest="cdrom_read_offset", default=None)
    parser.add_argument("--cdrom-write-offset", type=int,
                        dest="cdrom_write_offset", default=None)
    parser.add_argument("--fs-encoding", dest="fs_encoding",
                        default=None)
    parser.add_argument("--io-encoding", dest="io_encoding",
                        default=None)
    parser.add_argument("--id3v2-version", dest="id3v2_version",
                        choices=("2.2", "2.3", "2.4"), default=None)
    parser.add_argument("--id3v1-version", dest="id3v1_version",
                        choices=("1.1", "none"), default=None)
    parser.add_argument("--id3v2-pad", dest="id3_digit_padding",
                        choices=("yes", "no"), default=None)
    parser.add_argument("-I", "--interactive",
                        action="store_true", default=False,
                        dest="interactive")

    options = parser.parse_args(argv)
    msg = Messenger("audiotools-config", options)

    from ..dispatch import AVAILABLE_TYPES, TYPE_MAP
    from ..utils import config as cfg

    # (section, key) per settable option; ordered so LAB_CONFIG_SET
    # messages list what changed
    settings = [
        ("quality", "Quality", None),     # key = the default type
        ("filename_format", "Filenames", "format"),
        ("maximum_jobs", "System", "maximum_jobs"),
        ("add_replaygain", "ReplayGain", "add_by_default"),
        ("use_musicbrainz", "MusicBrainz", "service"),
        ("musicbrainz_server", "MusicBrainz", "server"),
        ("musicbrainz_port", "MusicBrainz", "port"),
        ("use_freedb", "FreeDB", "service"),
        ("freedb_server", "FreeDB", "server"),
        ("freedb_port", "FreeDB", "port"),
        ("system_cdrom", "System", "cdrom"),
        ("cdrom_read_offset", "System", "cdrom_read_offset"),
        ("cdrom_write_offset", "System", "cdrom_write_offset"),
        ("fs_encoding", "System", "fs_encoding"),
        ("io_encoding", "System", "io_encoding"),
        ("id3v2_version", "ID3", "id3v2"),
        ("id3_digit_padding", "ID3", "pad"),
        ("id3v1_version", "ID3", "id3v1"),
    ]
    if options.interactive:
        # line-oriented interactive editor (the reference's -I is an
        # urwid frame; this build's interactive fallbacks are prompt
        # flows, ui.py's gating philosophy)
        current = cfg.DEFAULT_TYPE
        answer = input("default type [%s]: " % (current,)).strip()
        if answer:
            options.default_type = answer
        quality = input("default quality for %s []: " %
                        (options.default_type or current,)).strip()
        if quality:
            options.quality = quality

    changed = False
    if options.default_type is not None:
        if options.default_type not in TYPE_MAP:
            msg.error(ERR_UNSUPPORTED_AUDIO_TYPE %
                      {"type": options.default_type})
            return 1
        cfg.config.set_default("System", "default_type",
                               options.default_type)
        msg.info(LAB_CONFIG_SET % {"section": "System",
                                   "option": "default_type",
                                   "value": options.default_type})
        changed = True
    for (dest, section, key) in settings:
        value = getattr(options, dest)
        if value is None:
            continue
        if dest == "quality":
            key = options.default_type or cfg.DEFAULT_TYPE
            if (key in TYPE_MAP and
                    value not in TYPE_MAP[key].COMPRESSION_MODES):
                from ..text import ERR_UNSUPPORTED_COMPRESSION
                msg.error(ERR_UNSUPPORTED_COMPRESSION %
                          {"quality": value, "type": key})
                return 1
        cfg.config.set_default(section, key, str(value))
        msg.info(LAB_CONFIG_SET % {"section": section, "option": key,
                                   "value": value})
        changed = True
    if changed:
        import os
        with open(os.path.expanduser("~/.audiotools.cfg"), "w") as f:
            cfg.config.write(f)
        return 0

    msg.output(LAB_CONFIG_SYSTEM)
    msg.output(LAB_CONFIG_DEFAULT_TYPE % {"type": cfg.DEFAULT_TYPE})
    msg.output(LAB_CONFIG_MAX_JOBS % {"jobs": cfg.MAX_JOBS()})
    msg.output("")
    msg.output(LAB_CONFIG_FORMATS)

    table = output_table()
    row = table.row()
    for heading in ["type ", "name ", "available ", "description"]:
        row.add_column(heading)
    for audio_type in AVAILABLE_TYPES:
        row = table.row()
        row.add_column(audio_type.NAME + " ")
        row.add_column(audio_type.SUFFIX + " ")
        row.add_column(("yes" if audio_type.available() else "no") +
                       " ")
        row.add_column(audio_type.DESCRIPTION)
    for line in table.format():
        msg.output(line)

    # per-type quality modes (reference audiotools-config's quality
    # listing): every compression mode, with a description where the
    # format publishes one and a marker on the default
    msg.output("")
    msg.output(LAB_CONFIG_QUALITY)
    table = output_table()
    row = table.row()
    for heading in ["type ", "quality ", "description"]:
        row.add_column(heading)
    for audio_type in AVAILABLE_TYPES:
        if audio_type.COMPRESSION_MODES == ("",):
            modes = [""]
        else:
            modes = [m for m in audio_type.COMPRESSION_MODES
                     if (m in audio_type.COMPRESSION_DESCRIPTIONS or
                         m == audio_type.DEFAULT_COMPRESSION)]
        for mode in modes:
            row = table.row()
            row.add_column(audio_type.NAME + " ")
            label = mode if mode else "(none)"
            if mode == audio_type.DEFAULT_COMPRESSION:
                label = LAB_CONFIG_QUALITY_DEFAULT % {"mode": label}
            row.add_column(label + " ")
            row.add_column(
                audio_type.COMPRESSION_DESCRIPTIONS.get(mode, ""))
    for line in table.format():
        msg.output(line)

    return 0


if __name__ == "__main__":
    sys.exit(main())
