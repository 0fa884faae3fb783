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
    parser.add_argument("-t", "--type", action="append",
                        dest="accept_list", default=None,
                        metavar="type")
    parser.add_argument("--cue", dest="cuesheet", default=None)
    parser.add_argument("-S", "--no-summary", action="store_true",
                        dest="no_summary", default=False)
    parser.add_argument("filenames", nargs="+")

    options = parser.parse_args(argv)
    msg = Messenger("trackverify", options)

    # -t restricts verification to the named types (reference
    # trackverify's accept_list)
    filenames = options.filenames
    if options.accept_list:
        from ..dispatch import file_type, TYPE_MAP
        accept = set(options.accept_list)
        kept = []
        for filename in filenames:
            try:
                with open(filename, "rb") as f:
                    cls = file_type(f)
            except IOError:
                kept.append(filename)   # unreadable: reported below
                continue
            if cls is not None and cls.NAME in accept:
                kept.append(filename)
        filenames = kept

    progress_display = ProgressDisplay(msg)
    queue = ExecProgressQueue(progress_display)
    for filename in filenames:
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

    # cuesheet check (reference trackverify:397-430): the named (or
    # embedded) cuesheet's track lengths must match the file
    if options.cuesheet is not None and results:
        from ..dispatch import open as open_track
        from ..audiofile import read_sheet
        from ..sheets.cue import SheetException
        try:
            sheet = read_sheet(options.cuesheet)
            track = open_track(filenames[0])
            lengths = list(sheet.pcm_lengths(track.total_frames(),
                                             track.sample_rate()))
            if sum(lengths) != track.total_frames() or                     any(length <= 0 for length in lengths):
                msg.error("cuesheet does not match file length")
                return 1
        except (SheetException, IOError, ValueError) as err:
            msg.error(str(err))
            return 1

    if not options.no_summary and results:
        from ..utils.messenger import output_table
        from ..dispatch import file_type as _ft
        from ..text import LAB_TRACKVERIFY_RESULTS
        msg.output(LAB_TRACKVERIFY_RESULTS)
        msg.output("")
        by_format = {}
        for (filename, status, _checksums) in results:
            suffix = filename.rsplit(".", 1)[-1].lower()
            (ok, bad) = by_format.get(suffix, (0, 0))
            if status == "OK":
                by_format[suffix] = (ok + 1, bad)
            else:
                by_format[suffix] = (ok, bad + 1)
        table = output_table()
        row = table.row()
        for heading in ["format ", "success ", "failure"]:
            row.add_column(heading)
        for suffix in sorted(by_format):
            (ok, bad) = by_format[suffix]
            row = table.row()
            row.add_column(suffix + " ")
            row.add_column("%d " % (ok,))
            row.add_column("%d" % (bad,))
        for line in table.format():
            msg.output(line)

    return 0 if all(r[1] == "OK" for r in results) else 1


if __name__ == "__main__":
    sys.exit(main())
