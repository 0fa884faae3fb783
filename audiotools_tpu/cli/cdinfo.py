"""cdinfo: display CD (image) table-of-contents information.

Rebuild of the reference ``cdinfo`` tool: track list with offsets and
lengths plus the FreeDB / MusicBrainz / AccurateRip disc IDs.
"""

from __future__ import annotations

import argparse
import sys

from . import add_common_arguments
from ..utils.messenger import Messenger
from ..text import (DESC_CDINFO, HELP_CDROM, LAB_CDINFO_TRACKS,
                    LAB_CDINFO_LENGTH, LAB_CDINFO_FREEDB,
                    LAB_CDINFO_MUSICBRAINZ, LAB_CDINFO_ACCURATERIP,
                    LAB_CDINFO_HEADER)


def main(argv=None):
    parser = argparse.ArgumentParser(
        prog="cdinfo",
        description=DESC_CDINFO)
    add_common_arguments(parser)
    parser.add_argument("-c", "--cdrom", dest="cdrom", required=True,
                        help=HELP_CDROM)
    options = parser.parse_args(argv)
    msg = Messenger("cdinfo", options)

    from ..cdio import CDDA, SECTOR_FRAMES

    try:
        cdda = CDDA(options.cdrom)
    except (IOError, ValueError) as err:
        msg.error(str(err))
        return 1

    msg.output(LAB_CDINFO_TRACKS % {"count": len(cdda)})
    msg.output(LAB_CDINFO_LENGTH %
               {"minutes": cdda.length_in_seconds() // 60,
                "seconds": cdda.length_in_seconds() % 60})
    msg.output(LAB_CDINFO_FREEDB % {"id": cdda.freedb_disc_id()})
    msg.output(LAB_CDINFO_MUSICBRAINZ %
               {"id": cdda.musicbrainz_disc_id()})
    msg.output(LAB_CDINFO_ACCURATERIP %
               {"id": cdda.accuraterip_disc_id()})
    msg.output("")
    msg.output(LAB_CDINFO_HEADER)
    for (i, (offset, length)) in enumerate(cdda.track_offsets(), 1):
        msg.output("%2.2d %8d %8d %7.7s" %
                   (i, offset, length, "%.1f" % (length / 75.0,)))
    cdda.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
