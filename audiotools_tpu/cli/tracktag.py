"""tracktag: update audio file metadata.

Rebuild of the reference ``tracktag`` tool: per-field metadata setting,
field removal, cover art embedding, and ReplayGain application.
"""

from __future__ import annotations

import argparse
import sys

from . import add_common_arguments
from ..utils.messenger import Messenger


FIELD_OPTIONS = [
    ("--name", "track_name"),
    ("--artist", "artist_name"),
    ("--performer", "performer_name"),
    ("--composer", "composer_name"),
    ("--conductor", "conductor_name"),
    ("--album", "album_name"),
    ("--catalog", "catalog"),
    ("--number", "track_number"),
    ("--track-total", "track_total"),
    ("--album-number", "album_number"),
    ("--album-total", "album_total"),
    ("--ISRC", "ISRC"),
    ("--publisher", "publisher"),
    ("--media-type", "media"),
    ("--year", "year"),
    ("--date", "date"),
    ("--copyright", "copyright"),
    ("--comment", "comment"),
]


def main(argv=None):
    parser = argparse.ArgumentParser(
        prog="tracktag",
        description="update audio file metadata")
    add_common_arguments(parser)
    for (flag, field) in FIELD_OPTIONS:
        parser.add_argument(flag, dest=field, default=None)
    parser.add_argument("-r", "--replace", action="store_true",
                        default=False,
                        help="completely replace all metadata")
    parser.add_argument("--remove-images", action="store_true",
                        default=False)
    parser.add_argument("--front-cover", dest="front_cover",
                        default=None,
                        help="an image file of the front cover")
    parser.add_argument("--replay-gain", action="store_true",
                        dest="add_replay_gain", default=False)
    parser.add_argument("filenames", nargs="+")

    options = parser.parse_args(argv)
    msg = Messenger("tracktag", options)

    from ..dispatch import open_files
    from ..audiofile import MetaData, Image

    integer_fields = {"track_number", "track_total", "album_number",
                      "album_total"}
    updates = {}
    for (_flag, field) in FIELD_OPTIONS:
        value = getattr(options, field)
        if value is not None:
            if field in integer_fields:
                try:
                    updates[field] = int(value)
                except ValueError:
                    msg.error("invalid value for %s" % (field,))
                    return 1
            else:
                updates[field] = value

    audiofiles = open_files(options.filenames, sorted=False,
                            messenger=msg)
    if len(audiofiles) == 0:
        msg.error("you must specify at least 1 supported audio file")
        return 1

    for track in audiofiles:
        try:
            if options.replace:
                metadata = MetaData(**updates)
            else:
                metadata = track.get_metadata()
                if metadata is None:
                    metadata = MetaData()
                for (field, value) in updates.items():
                    setattr(metadata, field, value)

            if options.remove_images:
                for image in metadata.images():
                    metadata.delete_image(image)
            if options.front_cover is not None:
                with open(options.front_cover, "rb") as f:
                    metadata.add_image(Image.new(f.read(), "", 0))

            track.set_metadata(metadata)
        except (IOError, ValueError) as err:
            msg.error("%s: %s" % (track.filename, err))
            return 1

    if options.add_replay_gain:
        classes = {f.__class__ for f in audiofiles}
        for cls in classes:
            if cls.supports_replay_gain():
                cls.add_replay_gain([f.filename for f in audiofiles
                                     if f.__class__ is cls])

    return 0


if __name__ == "__main__":
    sys.exit(main())
