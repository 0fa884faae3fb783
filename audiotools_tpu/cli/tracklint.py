"""tracklint: check and repair metadata problems.

Rebuild of the reference ``tracklint`` tool (reference
``tracklint:73-121``): runs each track's metadata ``clean()`` to find
problems (leading/trailing whitespace, leading zeroes, empty fields),
reports them, applies fixes with ``--fix``, backs up the original
bytes as undoable patches with ``--db`` (``delta.UndoDB``) and rolls
them back with ``--undo``.
"""

from __future__ import annotations

from .. import text

import argparse
import sys

from . import add_common_arguments
from ..utils.messenger import Messenger
from ..text import (DESC_TRACKLINT, HELP_LINT_FIX, HELP_LINT_DB,
                    HELP_LINT_UNDO, ERR_UNDO_REQUIRES_DB,
                    LAB_RESTORED, LAB_NO_BACKUP, LAB_FIXED,
                    LAB_LINT_MESSAGE)


def main(argv=None):
    parser = argparse.ArgumentParser(
        prog="tracklint",
        description=DESC_TRACKLINT)
    add_common_arguments(parser)
    parser.add_argument("--fix", action="store_true", default=False,
                        help=HELP_LINT_FIX)
    parser.add_argument("--db", dest="db", default=None,
                        help=HELP_LINT_DB)
    parser.add_argument("--undo", action="store_true", default=False,
                        help=HELP_LINT_UNDO)
    parser.add_argument("filenames", nargs="+")

    options = parser.parse_args(argv)
    msg = Messenger("tracklint", options)

    from ..dispatch import open_files
    from .. import InvalidFile

    if options.undo and options.db is None:
        msg.error(ERR_UNDO_REQUIRES_DB)
        return 1

    undo_db = None
    if options.db is not None:
        from ..delta import UndoDB
        undo_db = UndoDB(options.db)

    try:
        if options.undo:
            undone = 0
            for filename in options.filenames:
                try:
                    if undo_db.undo(filename):
                        msg.info(LAB_RESTORED %
                                 {"filename": filename})
                        undone += 1
                    else:
                        msg.info(LAB_NO_BACKUP %
                                 {"filename": filename})
                except IOError as err:
                    msg.error(str(err))
                    return 1
            return 0

        tracks = open_files(options.filenames, messenger=msg)
        had_problems = False
        for track in tracks:
            try:
                metadata = track.get_metadata()
            except (IOError, ValueError) as err:
                msg.error(text.ERR_FILE_MESSAGE %
                          {"filename": track.filename,
                           "message": err})
                continue
            if metadata is None:
                continue
            (cleaned, fixes) = metadata.clean()
            if not fixes:
                continue
            had_problems = True
            for fix in fixes:
                msg.info(LAB_LINT_MESSAGE %
                         {"filename": track.filename,
                          "message": fix})
            if options.fix:
                if undo_db is not None:
                    import tempfile
                    import shutil
                    import os
                    backup = tempfile.mktemp()
                    shutil.copy2(track.filename, backup)
                    try:
                        track.set_metadata(cleaned)
                        undo_db.add(backup, track.filename)
                    finally:
                        os.unlink(backup)
                else:
                    track.set_metadata(cleaned)
                msg.info(LAB_FIXED % {"filename": track.filename})
        return 0
    finally:
        if undo_db is not None:
            undo_db.close()


if __name__ == "__main__":
    sys.exit(main())
