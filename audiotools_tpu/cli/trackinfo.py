"""trackinfo: display metadata and technical information.

Rebuild of the reference ``trackinfo`` tool.
"""

from __future__ import annotations

from .. import text

import argparse
import sys

from . import add_common_arguments
from ..utils.messenger import Messenger, output_table
from ..text import (DESC_TRACKINFO, HELP_INFO_NO_METADATA,
                    HELP_INFO_LOW_LEVEL, HELP_INFO_BITRATE,
                    HELP_INFO_PERCENTAGE,
                    HELP_INFO_CHANNEL_ASSIGNMENT,
                    LAB_INFO_ATTRIBS, LAB_INFO_CHANNELS,
                    LAB_INFO_CHANNEL, LAB_INFO_CHANNEL_UNDEFINED)


def main(argv=None):
    parser = argparse.ArgumentParser(
        prog="trackinfo",
        description=DESC_TRACKINFO)
    add_common_arguments(parser)
    parser.add_argument("-n", "--no-metadata", action="store_true",
                        dest="no_metadata", help=HELP_INFO_NO_METADATA)
    parser.add_argument("-L", "--low-level", action="store_true",
                        dest="low_level", help=HELP_INFO_LOW_LEVEL)
    parser.add_argument("-b", "--bitrate", action="store_true",
                        help=HELP_INFO_BITRATE)
    parser.add_argument("-%", "--percentage", action="store_true",
                        dest="percentage", help=HELP_INFO_PERCENTAGE)
    parser.add_argument("-C", "--channel-assignment",
                        action="store_true", dest="channel_assignment",
                        help=HELP_INFO_CHANNEL_ASSIGNMENT)
    parser.add_argument("filenames", nargs="+")

    options = parser.parse_args(argv)
    msg = Messenger("trackinfo", options)

    import os
    from ..dispatch import open as open_track
    from .. import UnsupportedFile, InvalidFile
    from ..pcmstream import ChannelMask

    for filename in options.filenames:
        try:
            track = open_track(filename)
        except (UnsupportedFile, InvalidFile, IOError) as err:
            msg.error(text.ERR_FILE_MESSAGE %
                      {"filename": filename, "message": err})
            continue

        seconds = float(track.seconds_length())
        if options.bitrate:
            try:
                bitrate = (os.path.getsize(filename) * 8) / \
                    (seconds * 1000) if seconds else 0
                msg.output(text.LAB_BITRATE_LINE %
                           {"bitrate": int(bitrate),
                            "filename": filename})
            except ZeroDivisionError:
                msg.output(text.LAB_BITRATE_LINE %
                           {"bitrate": "0", "filename": filename})
            continue
        if options.percentage:
            raw = (track.total_frames() * track.channels() *
                   track.bits_per_sample() // 8)
            pct = (os.path.getsize(filename) * 100 // raw) if raw \
                else 0
            msg.output(text.LAB_PERCENTAGE_LINE %
                       {"percent": pct, "filename": filename})
            continue

        msg.output(LAB_INFO_ATTRIBS %
                   {"filename": filename,
                    "minutes": int(seconds) // 60,
                    "seconds": int(seconds) % 60,
                    "channels": track.channels(),
                    "sample_rate": track.sample_rate(),
                    "bits_per_sample": track.bits_per_sample(),
                    "name": track.NAME})

        if not options.no_metadata:
            metadata = track.get_metadata()
            if metadata is not None:
                if options.low_level:
                    msg.output(metadata.raw_info())
                else:
                    msg.output(str(metadata))
            msg.output("")

        if options.channel_assignment:
            msg.output(LAB_INFO_CHANNELS)
            mask = track.channel_mask()
            if mask.defined():
                for (i, channel) in enumerate(mask.channels()):
                    msg.output(LAB_INFO_CHANNEL %
                               {"channel": i + 1,
                                "name": channel.replace("_", " ")})
            else:
                for i in range(track.channels()):
                    msg.output(LAB_INFO_CHANNEL_UNDEFINED %
                               {"channel": i + 1})

    return 0


if __name__ == "__main__":
    sys.exit(main())
