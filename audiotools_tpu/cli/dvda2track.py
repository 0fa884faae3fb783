"""dvda2track: extract DVD-Audio titles to audio tracks.

Rebuild of the reference ``dvda2track`` tool: decodes each track of a
title through the AOB PCM reader into the chosen output format."""

from __future__ import annotations

import argparse
import os
import sys

from . import add_common_arguments
from ..utils.messenger import Messenger
from ..text import (DESC_DVDA2TRACK, HELP_AUDIO_TS,
                    HELP_DVDA_TITLE, HELP_TYPE, HELP_QUALITY,
                    HELP_DIR, ERR_UNSUPPORTED_TYPE,
                    LAB_DVDA_EXTRACTED)


def main(argv=None):
    parser = argparse.ArgumentParser(
        prog="dvda2track",
        description=DESC_DVDA2TRACK)
    add_common_arguments(parser)
    parser.add_argument("-A", "--audio-ts", dest="audio_ts",
                        required=True, help=HELP_AUDIO_TS)
    parser.add_argument("--title", dest="title", type=int, default=1,
                        help=HELP_DVDA_TITLE)
    parser.add_argument("--titleset", dest="titleset", type=int,
                        default=1)
    parser.add_argument("-t", "--type", dest="type", default="flac",
                        help=HELP_TYPE)
    parser.add_argument("-q", "--quality", dest="quality", default="",
                        help=HELP_QUALITY)
    parser.add_argument("-d", "--dir", dest="dir", default=".",
                        help=HELP_DIR)
    parser.add_argument("tracks", nargs="*", type=int)
    options = parser.parse_args(argv)
    msg = Messenger("dvda2track", options)

    from ..dvda import DVDAudio, InvalidDVDA
    from ..dispatch import TYPE_MAP
    from ..pcmstream import LimitedPCMReader, BufferedPCMReader
    from ..audiofile import MetaData

    if options.type not in TYPE_MAP:
        msg.error(ERR_UNSUPPORTED_TYPE % {"type": options.type})
        return 1
    output_class = TYPE_MAP[options.type]

    try:
        dvda = DVDAudio(options.audio_ts)
        titles = dvda[options.titleset - 1]
        title = titles[options.title - 1]
    except (IOError, IndexError, InvalidDVDA) as err:
        msg.error(str(err))
        return 1

    track_numbers = options.tracks or list(
        range(1, len(title) + 1))
    os.makedirs(options.dir, exist_ok=True)

    try:
        reader = BufferedPCMReader(title.to_pcm())
    except ValueError as err:
        msg.error(str(err))
        return 1

    # tracks are consecutive PTS windows of the title's PCM stream
    position = 1
    for track in title.tracks:
        frames = track.total_frames()
        if position in track_numbers:
            filename = os.path.join(
                options.dir,
                output_class.track_name(
                    file_path="track%2.2d" % (position,),
                    track_metadata=MetaData(track_number=position,
                                            track_total=len(title)),
                    format=None))
            try:
                output_class.from_pcm(
                    filename, LimitedPCMReader(reader, frames),
                    compression=options.quality or None)
            except (IOError, ValueError) as err:
                msg.error(str(err))
                return 1
            msg.info(LAB_DVDA_EXTRACTED % {"track": position})
        else:
            remaining = frames
            while remaining > 0:
                fl = reader.read(min(remaining, 65536))
                if fl.frames == 0:
                    break
                remaining -= fl.frames
        position += 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
