"""covertag: embed cover art images into audio files.

Rebuild of the reference ``covertag`` tool."""

from __future__ import annotations

from .. import text

import argparse
import sys

from . import add_common_arguments
from ..utils.messenger import Messenger
from ..text import (DESC_COVERTAG, HELP_TAG_FRONT_COVER,
                    HELP_TAG_BACK_COVER, HELP_TAG_LEAFLET,
                    HELP_TAG_MEDIA_IMAGE, HELP_TAG_OTHER_IMAGE,
                    HELP_TAG_REMOVE_IMAGES, ERR_1_FILE_REQUIRED,
                    LAB_TRACKTAG_TAGGED)

IMAGE_TYPES = {"front": 0, "back": 1, "leaflet": 2, "media": 3,
               "other": 4}


def main(argv=None):
    parser = argparse.ArgumentParser(
        prog="covertag",
        description=DESC_COVERTAG)
    add_common_arguments(parser)
    parser.add_argument("--front-cover", action="append",
                        dest="front", default=[],
                        help=HELP_TAG_FRONT_COVER)
    parser.add_argument("--back-cover", action="append",
                        dest="back", default=[],
                        help=HELP_TAG_BACK_COVER)
    parser.add_argument("--leaflet", action="append",
                        dest="leaflet", default=[],
                        help=HELP_TAG_LEAFLET)
    parser.add_argument("--media", action="append",
                        dest="media", default=[],
                        help=HELP_TAG_MEDIA_IMAGE)
    parser.add_argument("--other-image", action="append",
                        dest="other", default=[],
                        help=HELP_TAG_OTHER_IMAGE)
    parser.add_argument("-r", "--replace", action="store_true",
                        default=False, dest="replace")
    parser.add_argument("--remove-images", action="store_true",
                        default=False, help=HELP_TAG_REMOVE_IMAGES)
    parser.add_argument("filenames", nargs="+")
    options = parser.parse_args(argv)
    msg = Messenger("covertag", options)

    from ..dispatch import open_files
    from ..audiofile import Image

    tracks = open_files(options.filenames, messenger=msg)
    if len(tracks) == 0:
        msg.error(ERR_1_FILE_REQUIRED)
        return 1

    new_images = []
    for (kind, paths) in (("front", options.front),
                          ("back", options.back),
                          ("leaflet", options.leaflet),
                          ("media", options.media),
                          ("other", options.other)):
        for path in paths:
            try:
                with open(path, "rb") as f:
                    data = f.read()
            except IOError as err:
                msg.error(str(err))
                return 1
            new_images.append(Image.new(data, "",
                                        IMAGE_TYPES[kind]))

    for track in tracks:
        metadata = track.get_metadata()
        if metadata is None:
            from ..audiofile import MetaData
            metadata = MetaData()
        if options.remove_images or options.replace:
            for image in list(metadata.images()):
                metadata.delete_image(image)
        for image in new_images:
            metadata.add_image(image)
        try:
            track.set_metadata(metadata)
        except (IOError, ValueError) as err:
            msg.error(text.ERR_FILE_MESSAGE %
                      {"filename": track.filename, "message": err})
            return 1
        msg.info(LAB_TRACKTAG_TAGGED % {"filename": track.filename})
    return 0


if __name__ == "__main__":
    sys.exit(main())
