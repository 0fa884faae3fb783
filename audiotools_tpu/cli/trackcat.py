"""trackcat: concatenate audio tracks into one file.

Rebuild of the reference ``trackcat`` (trackcat:327-330:
PCMCat over source readers -> from_pcm).
"""

from __future__ import annotations

import argparse
import sys

from . import (audiofile_type, default_type,
               add_common_arguments, add_lookup_arguments)
from ..utils.messenger import Messenger, SingleProgressDisplay
from ..text import (DESC_TRACKCAT, HELP_TYPE, HELP_QUALITY,
                    HELP_CAT_OUTPUT, HELP_CUESHEET,
                    ERR_1_FILE_REQUIRED, ERR_TRACKCAT_SAMPLE_RATES,
                    ERR_TRACKCAT_CHANNELS, ERR_TRACKCAT_BPS)


def main(argv=None):
    parser = argparse.ArgumentParser(
        prog="trackcat",
        description=DESC_TRACKCAT)
    add_common_arguments(parser)
    parser.add_argument("-t", "--type", dest="type", default=None,
                        help=HELP_TYPE)
    parser.add_argument("-q", "--quality", dest="quality", default="",
                        help=HELP_QUALITY)
    parser.add_argument("-o", "--output", dest="output",
                        required=True, help=HELP_CAT_OUTPUT)
    parser.add_argument("-I", "--interactive",
                        action="store_true", default=False,
                        dest="interactive")
    add_lookup_arguments(parser)
    parser.add_argument("--cue", dest="cuesheet", default=None,
                        help=HELP_CUESHEET)
    parser.add_argument("filenames", nargs="+")

    options = parser.parse_args(argv)
    msg = Messenger("trackcat", options)

    from ..dispatch import open_files
    from ..pcmstream import PCMCat, PCMReaderProgress

    audiofiles = open_files(options.filenames, sorted=False,
                            messenger=msg)
    if len(audiofiles) == 0:
        msg.error(ERR_1_FILE_REQUIRED)
        return 1

    if len({f.sample_rate() for f in audiofiles}) != 1:
        msg.error(ERR_TRACKCAT_SAMPLE_RATES)
        return 1
    if len({f.channels() for f in audiofiles}) != 1:
        msg.error(ERR_TRACKCAT_CHANNELS)
        return 1
    if len({f.bits_per_sample() for f in audiofiles}) != 1:
        msg.error(ERR_TRACKCAT_BPS)
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

    # album metadata for the combined image (reference trackcat -M:
    # treat the inputs as one CD and keep the album-level fields of
    # the chosen service entry)
    if options.metadata_lookup:
        from ..services.lookup import track_metadata_lookup
        from ..audiofile import MetaData
        choices = track_metadata_lookup(
            audiofiles,
            musicbrainz_server=options.musicbrainz_server,
            musicbrainz_port=options.musicbrainz_port,
            freedb_server=options.freedb_server,
            freedb_port=options.freedb_port,
            use_musicbrainz=options.use_musicbrainz,
            use_freedb=options.use_freedb)
        if options.interactive:
            from .. import ui
            if not ui.AVAILABLE:
                ui.not_available_message(msg)
                return 1
            chosen = ui.select_metadata(choices, msg)
        else:
            chosen = (choices[-1] if options.use_default
                      else choices[0])
        if chosen:
            first = chosen[0]
            encoded.set_metadata(MetaData(
                album_name=first.album_name,
                artist_name=first.artist_name,
                year=first.year,
                track_total=len(chosen)))

    return 0


if __name__ == "__main__":
    sys.exit(main())
