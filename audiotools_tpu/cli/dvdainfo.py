"""dvdainfo: display DVD-Audio disc information.

Rebuild of the reference ``dvdainfo`` tool."""

from __future__ import annotations

from .. import text

import argparse
import sys

from . import add_common_arguments
from ..utils.messenger import Messenger
from ..text import DESC_DVDAINFO, HELP_AUDIO_TS


def main(argv=None):
    parser = argparse.ArgumentParser(
        prog="dvdainfo", description=DESC_DVDAINFO)
    add_common_arguments(parser)
    parser.add_argument("-A", "--audio-ts", dest="audio_ts",
                        required=True, help=HELP_AUDIO_TS)
    options = parser.parse_args(argv)
    msg = Messenger("dvdainfo", options)

    from ..dvda import DVDAudio, InvalidDVDA, PTS_PER_SECOND

    try:
        dvda = DVDAudio(options.audio_ts)
    except (IOError, InvalidDVDA) as err:
        msg.error(str(err))
        return 1

    for (t, titles) in enumerate(dvda.titlesets, 1):
        msg.output(text.LAB_DVDA_TITLESET % {"titleset": t})
        for title in titles:
            stream = {0xA0: "PCM", 0xA1: "MLP"}.get(
                title.stream_id, "unknown")
            msg.output(
                "  Title %d: %d track(s), %d:%2.2d, %dHz %dch "
                "%d-bit %s" %
                (title.title, len(title),
                 title.pts_length // PTS_PER_SECOND // 60,
                 (title.pts_length // PTS_PER_SECOND) % 60,
                 title.sample_rate, title.channels,
                 title.bits_per_sample, stream))
            for track in title.tracks:
                msg.output(
                    "    Track %d: sectors %d-%d, %.1fs" %
                    (track.track, track.first_sector,
                     track.last_sector,
                     track.pts_length / PTS_PER_SECOND))
    return 0


if __name__ == "__main__":
    sys.exit(main())
