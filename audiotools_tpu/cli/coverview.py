"""coverview: display embedded cover art.

Rebuild of the reference ``coverview`` tool (Tkinter viewer,
reference coverview:51,322); falls back to a text listing when no
display is available."""

from __future__ import annotations

from .. import text

import argparse
import sys

from . import add_common_arguments
from ..utils.messenger import Messenger
from ..text import (DESC_COVERVIEW, ERR_NO_IMAGES,
                    LAB_VIEWER_UNAVAILABLE)


def main(argv=None):
    parser = argparse.ArgumentParser(
        prog="coverview", description=DESC_COVERVIEW)
    add_common_arguments(parser)
    parser.add_argument("filename")
    options = parser.parse_args(argv)
    msg = Messenger("coverview", options)

    from ..dispatch import open as open_track

    try:
        track = open_track(options.filename)
    except (IOError, ValueError) as err:
        msg.error(str(err))
        return 1
    metadata = track.get_metadata()
    images = metadata.images() if metadata is not None else []
    if not images:
        msg.error(ERR_NO_IMAGES % {"filename": options.filename})
        return 1

    import os
    if os.environ.get("DISPLAY"):
        try:
            import tkinter
            from tkinter import PhotoImage
            root = tkinter.Tk()
            root.title(options.filename)
            photo = PhotoImage(data=images[0].data)
            label = tkinter.Label(root, image=photo)
            label.pack()
            root.mainloop()
            return 0
        except Exception as err:
            msg.info(LAB_VIEWER_UNAVAILABLE % {"error": err})

    for (i, image) in enumerate(images):
        msg.output(text.LAB_COVER_LINE %
                   {"index": i, "type": image.type_string(),
                    "width": image.width, "height": image.height,
                    "mime": image.mime_type,
                    "size": len(image.data)})
    return 0


if __name__ == "__main__":
    sys.exit(main())
