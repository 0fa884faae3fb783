"""tracksplit: split one audio image into tracks by cuesheet.

Rebuild of the reference ``tracksplit`` (tracksplit:246-312:
pcm_split + Sheet.pcm_lengths).
"""

from __future__ import annotations

import argparse
import os
import sys

from . import (audiofile_type, default_type,
               add_common_arguments, add_lookup_arguments)
from ..utils.messenger import Messenger, ProgressDisplay
from ..utils.config import FILENAME_FORMAT
from ..text import (DESC_TRACKSPLIT, HELP_TYPE, HELP_QUALITY,
                    HELP_DIR, HELP_FORMAT, HELP_CUESHEET,
                    ERR_TRACKSPLIT_NO_CUESHEET, LAB_T2T_CONVERTED)


def main(argv=None):
    parser = argparse.ArgumentParser(
        prog="tracksplit",
        description=DESC_TRACKSPLIT)
    add_common_arguments(parser)
    parser.add_argument("-t", "--type", dest="type", default=None,
                        help=HELP_TYPE)
    parser.add_argument("-q", "--quality", dest="quality", default="",
                        help=HELP_QUALITY)
    parser.add_argument("-d", "--dir", dest="dir", default=".",
                        help=HELP_DIR)
    parser.add_argument("--format", dest="format",
                        default=None, help=HELP_FORMAT)
    parser.add_argument("--cue", dest="cuesheet", default=None,
                        help=HELP_CUESHEET)
    parser.add_argument("-j", "--joint", dest="max_processes",
                        type=int, default=None)
    parser.add_argument("--album-number", type=int,
                        dest="album_number", default=None)
    parser.add_argument("--album-total", type=int,
                        dest="album_total", default=None)
    parser.add_argument("--replay-gain", action="store_true",
                        dest="add_replay_gain", default=False)
    parser.add_argument("--no-replay-gain", action="store_false",
                        dest="add_replay_gain")
    parser.add_argument("-I", "--interactive",
                        action="store_true", default=False,
                        dest="interactive")
    add_lookup_arguments(parser)
    parser.add_argument("filename", nargs=1)

    options = parser.parse_args(argv)
    msg = Messenger("tracksplit", options)

    from ..dispatch import open as open_track
    from ..audiofile import read_sheet, SheetException, MetaData
    from ..pcmstream import pcm_split

    try:
        track = open_track(options.filename[0])
    except Exception as err:
        msg.error(str(err))
        return 1

    if options.cuesheet is not None:
        try:
            sheet = read_sheet(options.cuesheet)
        except SheetException as err:
            msg.error(str(err))
            return 1
    else:
        sheet = track.get_cuesheet()
        if sheet is None:
            msg.error(ERR_TRACKSPLIT_NO_CUESHEET)
            return 1

    if options.type is None:
        options.type = default_type()
    output_class = audiofile_type(msg, options.type)
    if output_class is None:
        return 1

    pcm_lengths = list(sheet.pcm_lengths(track.total_frames(),
                                         track.sample_rate()))
    base_metadata = track.get_metadata()

    # per-track metadata from the lookup services (reference
    # tracksplit's -M: the sheet's track layout is the disc ID)
    lookup_metadatas = None
    if options.metadata_lookup:
        from ..services.lookup import sheet_metadata_lookup
        choices = sheet_metadata_lookup(
            sheet, track.total_frames(), track.sample_rate(),
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
            lookup_metadatas = ui.select_metadata(choices, msg)
        else:
            lookup_metadatas = (choices[-1] if options.use_default
                                else choices[0])

    os.makedirs(options.dir, exist_ok=True)
    output_tracks = []
    for (i, sub_reader) in enumerate(pcm_split(track.to_pcm(),
                                               pcm_lengths)):
        track_number = i + 1
        if (lookup_metadatas is not None and
                i < len(lookup_metadatas)):
            metadata = lookup_metadatas[i]
            metadata.track_number = track_number
            metadata.track_total = len(pcm_lengths)
        else:
            metadata = MetaData(track_number=track_number,
                                track_total=len(pcm_lengths))
            if base_metadata is not None:
                metadata.album_name = base_metadata.album_name
                metadata.artist_name = base_metadata.artist_name
                metadata.year = base_metadata.year
        if options.album_number is not None:
            metadata.album_number = options.album_number
        if options.album_total is not None:
            metadata.album_total = options.album_total

        filename = output_class.track_name(
            track.filename, metadata,
            options.format or FILENAME_FORMAT,
            suffix=output_class.SUFFIX)
        destination = os.path.join(options.dir, filename)
        try:
            new_track = output_class.from_pcm(
                destination, sub_reader, options.quality or None,
                total_pcm_frames=pcm_lengths[i])
            new_track.set_metadata(metadata)
            output_tracks.append(destination)
            msg.output(LAB_T2T_CONVERTED %
                       {"source": track.filename,
                        "destination": destination})
        except Exception as err:
            msg.error(str(err))
            return 1

    if (options.add_replay_gain and
            output_class.supports_replay_gain() and output_tracks):
        from .. import text as text_mod
        msg.info(text_mod.RG_ADDING_REPLAYGAIN_WAIT)
        output_class.add_replay_gain(output_tracks)
        msg.info(text_mod.RG_REPLAYGAIN_ADDED)

    return 0


if __name__ == "__main__":
    sys.exit(main())
