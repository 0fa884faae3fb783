"""cdplay: play CD (image) audio tracks in the terminal.

Rebuild of the reference ``cdplay`` tool over CDPlayer."""

from __future__ import annotations

import argparse
import sys
import time

from . import add_common_arguments
from ..utils.messenger import Messenger
from ..text import (DESC_CDPLAY, HELP_CDROM, HELP_PLAY_OUTPUT,
                    LAB_CDPLAY_TRACK, LAB_STOPPED)


def main(argv=None):
    parser = argparse.ArgumentParser(
        prog="cdplay", description=DESC_CDPLAY)
    add_common_arguments(parser)
    parser.add_argument("-c", "--cdrom", dest="cdrom", required=True,
                        help=HELP_CDROM)
    parser.add_argument("-o", "--output", dest="output", default=None,
                        help=HELP_PLAY_OUTPUT)
    parser.add_argument("tracks", nargs="*", type=int)
    options = parser.parse_args(argv)
    msg = Messenger("cdplay", options)

    from ..cdio import CDDA
    from ..player import CDPlayer, open_output

    try:
        cdda = CDDA(options.cdrom)
        output = open_output(options.output)
    except (IOError, ValueError) as err:
        msg.error(str(err))
        return 1

    player = CDPlayer(cdda, output)
    try:
        for number in (options.tracks or
                       range(1, len(cdda) + 1)):
            msg.info(LAB_CDPLAY_TRACK % {"track": number})
            player.open(number)
            player.play()
            deadline = time.time() + 10
            while player.state() == 0 and time.time() < deadline:
                time.sleep(0.05)
            while player.state() != 0:
                time.sleep(0.1)
    except KeyboardInterrupt:
        msg.info(LAB_STOPPED)
    finally:
        player.close()
        cdda.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
