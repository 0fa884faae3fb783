"""trackverify: verify audio files for correctness.

Rebuild of the reference ``trackverify`` (trackverify:104-215):
full-decode verification with per-file results in a job queue, plus
AccurateRip checksum computation for CD-format tracks.
"""

from __future__ import annotations

import argparse
import sys

from . import add_common_arguments
from ..utils.messenger import Messenger, ProgressDisplay
from ..utils.config import MAX_JOBS
from ..parallel.queue import ExecProgressQueue, ExecQueueError
from ..text import (DESC_TRACKVERIFY, HELP_JOINT,
                    HELP_VERIFY_ACCURATERIP,
                    LAB_ACCURATERIP_MATCH, LAB_ACCURATERIP_MISMATCH,
                    LAB_ACCURATERIP_NOT_FOUND,
                    LAB_TRACKVERIFY_OK,
                    LAB_TRACKVERIFY_FAILED)


def verify(filename, accuraterip, progress=None):
    from ..dispatch import open as open_track
    from .. import InvalidFile, UnsupportedFile

    try:
        track = open_track(filename)
    except (IOError, UnsupportedFile, InvalidFile) as err:
        return (filename, str(err) or type(err).__name__, None)
    try:
        track.verify(progress)
        result = "OK"
    except InvalidFile as err:
        result = str(err)

    checksums = None
    if (accuraterip and result == "OK" and
            track.sample_rate() == 44100 and
            track.channels() == 2 and
            track.bits_per_sample() == 16):
        from ..accuraterip_checksum import accuraterip_checksums
        checksums = accuraterip_checksums(track.to_pcm(),
                                          track.total_frames())

    return (filename, result, checksums)


def report(result):
    (filename, status, checksums) = result
    if status == "OK":
        line = LAB_TRACKVERIFY_OK % {"filename": filename}
    else:
        line = LAB_TRACKVERIFY_FAILED % {"filename": filename,
                                         "error": status}
    if checksums is not None:
        line += " (AccurateRip v1=%08X v2=%08X)" % (checksums[0],
                                                    checksums[1])
    return line


def main(argv=None):
    parser = argparse.ArgumentParser(
        prog="trackverify",
        description=DESC_TRACKVERIFY)
    add_common_arguments(parser)
    parser.add_argument("-j", "--joint", dest="max_processes",
                        type=int, default=None, help=HELP_JOINT)
    parser.add_argument("--accuraterip", action="store_true",
                        default=False,
                        help=HELP_VERIFY_ACCURATERIP)
    parser.add_argument("filenames", nargs="+")

    options = parser.parse_args(argv)
    msg = Messenger("trackverify", options)

    progress_display = ProgressDisplay(msg)
    queue = ExecProgressQueue(progress_display)
    for filename in options.filenames:
        queue.execute(verify,
                      progress_text=filename,
                      completion_output=report,
                      filename=filename,
                      accuraterip=options.accuraterip)

    try:
        results = queue.run(options.max_processes or MAX_JOBS())
    except (ExecQueueError, IOError, ValueError) as err:
        msg.error(str(err))
        return 1

    if options.accuraterip:
        # compare the computed checksums against the AccurateRip
        # database (reference trackverify:104-144); with no network
        # access the lookup degrades to empty match lists
        from ..dispatch import open_files, sorted_tracks
        from ..services.lookup import accuraterip_lookup

        verified = [(filename, checksums)
                    for (filename, status, checksums) in results
                    if status == "OK" and checksums is not None]
        if verified:
            tracks = sorted_tracks(open_files(
                [f for (f, _c) in verified], messenger=msg))
            matches = accuraterip_lookup(tracks)
            for (number, (filename, checksums)) in \
                    enumerate(verified, 1):
                entries = matches.get(number, [])
                hits = [confidence for (confidence, crc, crc2)
                        in entries
                        if crc in checksums or crc2 in checksums]
                if hits:
                    msg.info(LAB_ACCURATERIP_MATCH %
                             {"filename": filename,
                              "confidence": max(hits)})
                elif entries:
                    msg.info(LAB_ACCURATERIP_MISMATCH %
                             {"filename": filename})
                else:
                    msg.info(LAB_ACCURATERIP_NOT_FOUND %
                             {"filename": filename})

    return 0 if all(r[1] == "OK" for r in results) else 1


if __name__ == "__main__":
    sys.exit(main())
