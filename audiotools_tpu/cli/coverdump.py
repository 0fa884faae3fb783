"""coverdump: extract embedded cover art to image files.

Rebuild of the reference ``coverdump`` tool."""

from __future__ import annotations

import argparse
import os
import sys

from . import add_common_arguments
from ..utils.messenger import Messenger
from ..text import (DESC_COVERDUMP, HELP_DIR,
                    HELP_COVERDUMP_PREFIX, ERR_1_FILE_REQUIRED,
                    ERR_NO_IMAGES_PLAIN, LAB_DUMPED_IMAGE)


def main(argv=None):
    parser = argparse.ArgumentParser(
        prog="coverdump",
        description=DESC_COVERDUMP)
    add_common_arguments(parser)
    parser.add_argument("-d", "--dir", dest="dir", default=".",
                        help=HELP_DIR)
    parser.add_argument("-p", "--prefix", dest="prefix", default="",
                        help=HELP_COVERDUMP_PREFIX)
    parser.add_argument("filenames", nargs="+")
    options = parser.parse_args(argv)
    msg = Messenger("coverdump", options)

    from ..dispatch import open_files

    tracks = open_files(options.filenames, messenger=msg)
    if len(tracks) == 0:
        msg.error(ERR_1_FILE_REQUIRED)
        return 1

    os.makedirs(options.dir, exist_ok=True)
    dumped = 0
    for track in tracks:
        metadata = track.get_metadata()
        if metadata is None:
            continue
        for (i, image) in enumerate(metadata.images()):
            base = os.path.splitext(
                os.path.basename(track.filename))[0]
            output = os.path.join(
                options.dir,
                "%s%s-%s%2.2d.%s" % (options.prefix, base,
                                     image.type_string().replace(
                                         " ", "_").lower(),
                                     i, image.suffix()))
            with open(output, "wb") as f:
                f.write(image.data)
            msg.info(LAB_DUMPED_IMAGE % {"output": output})
            dumped += 1
    if dumped == 0:
        msg.error(ERR_NO_IMAGES_PLAIN)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
