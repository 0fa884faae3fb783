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
                    HELP_CONFIG_TYPE)


def main(argv=None):
    parser = argparse.ArgumentParser(
        prog="audiotools-config",
        description=DESC_CONFIG)
    add_common_arguments(parser)
    parser.add_argument("-t", "--type", dest="default_type",
                        default=None,
                        help=HELP_CONFIG_TYPE)

    options = parser.parse_args(argv)
    msg = Messenger("audiotools-config", options)

    from ..dispatch import AVAILABLE_TYPES, TYPE_MAP
    from ..utils import config as cfg

    if options.default_type is not None:
        if options.default_type not in TYPE_MAP:
            msg.error(ERR_UNSUPPORTED_AUDIO_TYPE %
                      {"type": options.default_type})
            return 1
        cfg.config.set_default("System", "default_type",
                               options.default_type)
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
