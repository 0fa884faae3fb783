"""trackcat: concatenate audio tracks into one file.

Rebuild of the reference ``trackcat`` (trackcat:327-330:
PCMCat over source readers -> from_pcm).
"""

from __future__ import annotations

import argparse
import sys

from . import audiofile_type, default_type, add_common_arguments
from ..utils.messenger import Messenger, SingleProgressDisplay


def main(argv=None):
    parser = argparse.ArgumentParser(
        prog="trackcat",
        description="concatenate audio files into a single file")
    add_common_arguments(parser)
    parser.add_argument("-t", "--type", dest="type", default=None)
    parser.add_argument("-q", "--quality", dest="quality", default="")
    parser.add_argument("-o", "--output", dest="output",
                        required=True)
    parser.add_argument("--cue", dest="cuesheet", default=None,
                        help="a cuesheet to embed in the output file")
    parser.add_argument("filenames", nargs="+")

    options = parser.parse_args(argv)
    msg = Messenger("trackcat", options)

    from ..dispatch import open_files
    from ..pcmstream import PCMCat, PCMReaderProgress

    audiofiles = open_files(options.filenames, sorted=False,
                            messenger=msg)
    if len(audiofiles) == 0:
        msg.error("you must specify at least 1 supported audio file")
        return 1

    if len({f.sample_rate() for f in audiofiles}) != 1:
        msg.error("all audio files must have the same sample rate")
        return 1
    if len({f.channels() for f in audiofiles}) != 1:
        msg.error("all audio files must have the same channel count")
        return 1
    if len({f.bits_per_sample() for f in audiofiles}) != 1:
        msg.error("all audio files must have the same bits per sample")
        return 1

    if options.type is None:
        options.type = default_type()
    output_class = audiofile_type(msg, options.type)
    if output_class is None:
        return 1

    total_frames = sum(f.total_frames() for f in audiofiles)
    progress = SingleProgressDisplay(msg, options.output)

    try:
        encoded = output_class.from_pcm(
            options.output,
            PCMReaderProgress(
                PCMCat([f.to_pcm() for f in audiofiles]),
                total_frames, progress.update),
            options.quality or None,
            total_pcm_frames=total_frames)
    except Exception as err:
        msg.error(str(err))
        return 1

    if options.cuesheet is not None:
        from ..audiofile import read_sheet, SheetException
        try:
            encoded.set_cuesheet(read_sheet(options.cuesheet))
        except SheetException as err:
            msg.error(str(err))
            return 1

    return 0


if __name__ == "__main__":
    sys.exit(main())
