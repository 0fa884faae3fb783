"""trackcmp: compare audio files or directories pairwise.

Rebuild of the reference ``trackcmp`` (pcm_frame_cmp in a job queue).
"""

from __future__ import annotations

from .. import text

import argparse
import os
import sys

from . import add_common_arguments
from ..utils.messenger import Messenger, ProgressDisplay
from ..utils.config import MAX_JOBS
from ..parallel.queue import ExecProgressQueue, ExecQueueError
from ..text import (DESC_TRACKCMP, HELP_JOINT, LAB_TRACKCMP_OK,
                    LAB_TRACKCMP_MISMATCH)


def compare(filename1, filename2, progress=None):
    """compares two files, returning the first mismatch frame or None"""
    from ..dispatch import open as open_track
    from ..pcmstream import pcm_frame_cmp, PCMReaderProgress
    from .. import UnsupportedFile, InvalidFile

    try:
        track1 = open_track(filename1)
        track2 = open_track(filename2)
    except (IOError, UnsupportedFile, InvalidFile) as err:
        return (filename1, filename2, str(err))
    reader1 = track1.to_pcm()
    if progress is not None:
        reader1 = PCMReaderProgress(reader1, track1.total_frames(),
                                    progress)
    result = pcm_frame_cmp(reader1, track2.to_pcm())
    return (filename1, filename2, result)


def report(result):
    (filename1, filename2, mismatch) = result
    if mismatch is None:
        return LAB_TRACKCMP_OK % {"file1": filename1,
                                  "file2": filename2}
    elif isinstance(mismatch, str):
        return "%s <> %s : %s" % (filename1, filename2, mismatch)
    else:
        return LAB_TRACKCMP_MISMATCH % {"file1": filename1,
                                        "file2": filename2,
                                        "frame": mismatch + 1}


def main(argv=None):
    parser = argparse.ArgumentParser(
        prog="trackcmp",
        description=DESC_TRACKCMP)
    add_common_arguments(parser)
    parser.add_argument("-j", "--joint", dest="max_processes",
                        type=int, default=None, help=HELP_JOINT)
    parser.add_argument("-S", "--no-summary", action="store_true",
                        dest="no_summary", default=False)
    parser.add_argument("filenames", nargs="+")

    options = parser.parse_args(argv)
    msg = Messenger("trackcmp", options)

    paths = options.filenames
    pairs = []
    if (len(paths) == 2 and os.path.isdir(paths[0]) and
            os.path.isdir(paths[1])):
        names1 = sorted(os.listdir(paths[0]))
        for name in names1:
            other = os.path.join(paths[1], name)
            if os.path.isfile(other):
                pairs.append((os.path.join(paths[0], name), other))
            else:
                msg.output(text.LAB_CMP_MISSING % {"filename": other})
    elif len(paths) % 2 == 0:
        pairs = [(paths[i], paths[i + 1])
                 for i in range(0, len(paths), 2)]
    else:
        msg.error(text.ERR_PAIRS_REQUIRED)
        return 1

    progress_display = ProgressDisplay(msg)
    queue = ExecProgressQueue(progress_display)
    for (file1, file2) in pairs:
        queue.execute(compare,
                      progress_text="%s <> %s" % (file1, file2),
                      completion_output=report,
                      filename1=file1,
                      filename2=file2)

    try:
        results = queue.run(options.max_processes or MAX_JOBS())
    except (ExecQueueError, IOError, ValueError) as err:
        msg.error(str(err))
        return 1

    if not options.no_summary and results:
        matches = sum(1 for r in results if r[2] is None)
        msg.output("%d/%d OK" % (matches, len(results)))

    return 0 if all(r[2] is None for r in results) else 1


if __name__ == "__main__":
    sys.exit(main())
