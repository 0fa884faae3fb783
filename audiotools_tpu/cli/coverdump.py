"""coverdump: extract embedded cover art to image files.

Rebuild of the reference ``coverdump`` tool."""

from __future__ import annotations

import argparse
import os
import sys

from . import add_common_arguments
from ..utils.messenger import Messenger


def main(argv=None):
    parser = argparse.ArgumentParser(
        prog="coverdump",
        description="extract embedded cover art")
    add_common_arguments(parser)
    parser.add_argument("-d", "--dir", dest="dir", default=".")
    parser.add_argument("-p", "--prefix", dest="prefix", default="")
    parser.add_argument("filenames", nargs="+")
    options = parser.parse_args(argv)
    msg = Messenger("coverdump", options)

    from ..dispatch import open_files

    tracks = open_files(options.filenames, messenger=msg)
    if len(tracks) == 0:
        msg.error("you must specify at least 1 supported audio file")
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
            msg.info("dumped %s" % (output,))
            dumped += 1
    if dumped == 0:
        msg.error("no images found")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
