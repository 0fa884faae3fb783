"""trackrename: rename audio files based on metadata templates.

Rebuild of the reference ``trackrename`` tool.
"""

from __future__ import annotations

from .. import text

import argparse
import os
import sys

from . import add_common_arguments
from ..utils.messenger import Messenger
from ..utils.config import FILENAME_FORMAT
from ..text import (DESC_TRACKRENAME, HELP_FORMAT,
                    ERR_1_FILE_REQUIRED, ERR_TRACKRENAME_COLLISION,
                    LAB_TRACKRENAME_RENAMED)


def main(argv=None):
    parser = argparse.ArgumentParser(
        prog="trackrename",
        description=DESC_TRACKRENAME)
    add_common_arguments(parser)
    parser.add_argument("--format", dest="format",
                        default=FILENAME_FORMAT, help=HELP_FORMAT)
    parser.add_argument("-I", "--interactive", action="store_true",
                        default=False, dest="interactive")
    parser.add_argument("filenames", nargs="+")

    options = parser.parse_args(argv)
    msg = Messenger("trackrename", options)

    from ..dispatch import open_files

    audiofiles = open_files(options.filenames, sorted=False,
                            messenger=msg)
    if len(audiofiles) == 0:
        msg.error(ERR_1_FILE_REQUIRED)
        return 1

    for track in audiofiles:
        try:
            metadata = track.get_metadata()
            new_name = track.track_name(track.filename, metadata,
                                        options.format)
            new_path = os.path.join(os.path.dirname(track.filename),
                                    new_name)
            if os.path.abspath(new_path) != \
                    os.path.abspath(track.filename):
                if os.path.exists(new_path):
                    msg.error(ERR_TRACKRENAME_COLLISION %
                              {"source": new_path})
                    return 1
                if options.interactive:
                    # confirm each rename (reference trackrename -I)
                    answer = input("%s -> %s ? [y/N] " %
                                   (track.filename, new_path))
                    if answer.strip().lower() not in ("y", "yes"):
                        continue
                os.rename(track.filename, new_path)
                msg.output(LAB_TRACKRENAME_RENAMED %
                           {"source": track.filename,
                            "destination": new_path})
        except (IOError, ValueError) as err:
            msg.error(text.ERR_FILE_MESSAGE %
                      {"filename": track.filename, "message": err})
            return 1

    return 0


if __name__ == "__main__":
    sys.exit(main())
