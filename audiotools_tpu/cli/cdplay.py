"""cdplay: play CD (image) audio tracks in the terminal.

Rebuild of the reference ``cdplay`` tool over CDPlayer."""

from __future__ import annotations

import argparse
import sys
import time

from . import add_common_arguments
from ..utils.messenger import Messenger


def main(argv=None):
    parser = argparse.ArgumentParser(
        prog="cdplay", description="play CD audio")
    add_common_arguments(parser)
    parser.add_argument("-c", "--cdrom", dest="cdrom", required=True)
    parser.add_argument("-o", "--output", dest="output", default=None)
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
            msg.info("playing track %d" % (number,))
            player.open(number)
            player.play()
            deadline = time.time() + 10
            while player.state() == 0 and time.time() < deadline:
                time.sleep(0.05)
            while player.state() != 0:
                time.sleep(0.1)
    except KeyboardInterrupt:
        msg.info("stopped")
    finally:
        player.close()
        cdda.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
