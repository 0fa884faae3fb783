"""cdinfo: display CD (image) table-of-contents information.

Rebuild of the reference ``cdinfo`` tool: track list with offsets and
lengths plus the FreeDB / MusicBrainz / AccurateRip disc IDs.
"""

from __future__ import annotations

import argparse
import sys

from . import add_common_arguments
from ..utils.messenger import Messenger


def main(argv=None):
    parser = argparse.ArgumentParser(
        prog="cdinfo",
        description="display CD information")
    add_common_arguments(parser)
    parser.add_argument("-c", "--cdrom", dest="cdrom", required=True,
                        help="the CD image to inspect (.cue or .toc)")
    options = parser.parse_args(argv)
    msg = Messenger("cdinfo", options)

    from ..cdio import CDDA, SECTOR_FRAMES

    try:
        cdda = CDDA(options.cdrom)
    except (IOError, ValueError) as err:
        msg.error(str(err))
        return 1

    msg.output("Tracks : %d" % (len(cdda),))
    msg.output("Length : %d:%2.2d" %
               (cdda.length_in_seconds() // 60,
                cdda.length_in_seconds() % 60))
    msg.output("FreeDB ID      : %s" % (cdda.freedb_disc_id(),))
    msg.output("MusicBrainz ID : %s" % (cdda.musicbrainz_disc_id(),))
    msg.output("AccurateRip ID : %s" % (cdda.accuraterip_disc_id(),))
    msg.output("")
    msg.output("#  Offset   Length   Seconds")
    for (i, (offset, length)) in enumerate(cdda.track_offsets(), 1):
        msg.output("%2.2d %8d %8d %7.7s" %
                   (i, offset, length, "%.1f" % (length / 75.0,)))
    cdda.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
