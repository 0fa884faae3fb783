"""tracklength: sum the lengths of audio files.

Rebuild of the reference ``tracklength`` tool.
"""

from __future__ import annotations

import argparse
import os
import sys

from . import add_common_arguments
from ..utils.messenger import Messenger
from ..text import DESC_TRACKLENGTH, LAB_TRACKLENGTH_TOTAL


def main(argv=None):
    parser = argparse.ArgumentParser(
        prog="tracklength",
        description=DESC_TRACKLENGTH)
    add_common_arguments(parser)
    parser.add_argument("filenames", nargs="+")

    options = parser.parse_args(argv)
    msg = Messenger("tracklength", options)

    from ..dispatch import open_files, open_directory

    audiofiles = []
    for path in options.filenames:
        if os.path.isdir(path):
            audiofiles.extend(open_directory(path, messenger=msg))
        else:
            audiofiles.extend(open_files([path], messenger=msg))

    total_seconds = sum(float(f.seconds_length()) for f in audiofiles)
    hours = int(total_seconds) // 3600
    minutes = (int(total_seconds) // 60) % 60
    seconds = int(round(total_seconds)) % 60
    msg.output(LAB_TRACKLENGTH_TOTAL % {"hours": hours,
                                        "minutes": minutes,
                                        "seconds": seconds})
    return 0


if __name__ == "__main__":
    sys.exit(main())
