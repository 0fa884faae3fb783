"""dvda2track: extract DVD-Audio titles to audio tracks.

Rebuild of the reference ``dvda2track`` tool: decodes each track of a
title through the AOB PCM reader into the chosen output format."""

from __future__ import annotations

import argparse
import os
import sys

from . import add_common_arguments, add_lookup_arguments
from ..utils.messenger import Messenger
from ..text import (DESC_DVDA2TRACK, HELP_AUDIO_TS,
                    HELP_DVDA_TITLE, HELP_TYPE, HELP_QUALITY,
                    HELP_DIR, ERR_UNSUPPORTED_TYPE,
                    LAB_DVDA_EXTRACTED)


def main(argv=None):
    parser = argparse.ArgumentParser(
        prog="dvda2track",
        description=DESC_DVDA2TRACK)
    add_common_arguments(parser)
    parser.add_argument("-A", "--audio-ts", dest="audio_ts",
                        required=True, help=HELP_AUDIO_TS)
    parser.add_argument("--title", dest="title", type=int, default=1,
                        help=HELP_DVDA_TITLE)
    parser.add_argument("--titleset", dest="titleset", type=int,
                        default=1)
    parser.add_argument("-t", "--type", dest="type", default="flac",
                        help=HELP_TYPE)
    parser.add_argument("-q", "--quality", dest="quality", default="",
                        help=HELP_QUALITY)
    parser.add_argument("-d", "--dir", dest="dir", default=".",
                        help=HELP_DIR)
    parser.add_argument("--format", dest="format", default=None)
    # physical drive for CPPM key exchange (reference dvda2track -c;
    # hardware-gated here like cppm.CPPMDecoder)
    parser.add_argument("-c", "--cdrom", dest="cdrom", default=None)
    parser.add_argument("--track-start", dest="track_start",
                        type=int, default=1)
    parser.add_argument("--track-total", dest="track_total",
                        type=int, default=None)
    parser.add_argument("--album-number", type=int,
                        dest="album_number", default=None)
    parser.add_argument("--album-total", type=int,
                        dest="album_total", default=None)
    parser.add_argument("--replay-gain", action="store_true",
                        dest="add_replay_gain", default=False)
    parser.add_argument("--no-replay-gain", action="store_false",
                        dest="add_replay_gain")
    parser.add_argument("-I", "--interactive", action="store_true",
                        default=False, dest="interactive")
    add_lookup_arguments(parser)
    parser.add_argument("tracks", nargs="*", type=int)
    options = parser.parse_args(argv)
    msg = Messenger("dvda2track", options)

    from ..dvda import DVDAudio, InvalidDVDA
    from ..dispatch import TYPE_MAP
    from ..pcmstream import LimitedPCMReader, BufferedPCMReader
    from ..audiofile import MetaData

    if options.type not in TYPE_MAP:
        msg.error(ERR_UNSUPPORTED_TYPE % {"type": options.type})
        return 1
    output_class = TYPE_MAP[options.type]

    try:
        dvda = DVDAudio(options.audio_ts)
        titles = dvda[options.titleset - 1]
        title = titles[options.title - 1]
    except (IOError, IndexError, InvalidDVDA) as err:
        msg.error(str(err))
        return 1

    track_numbers = options.tracks or list(
        range(1, len(title) + 1))
    os.makedirs(options.dir, exist_ok=True)

    # metadata lookup (reference dvda2track's -M): the title's track
    # lengths stand in for CD track lengths when building the disc ID
    lookup_metadatas = None
    if options.metadata_lookup:
        from ..services.lookup import (parse_musicbrainz_xml,
                                       parse_xmcd)
        from ..services.freedb import DiscID as FreeDBDiscID
        from ..services.musicbrainz import DiscID as MBDiscID
        from ..services import musicbrainz, freedb

        sample_rate = title.tracks[0].sample_rate()
        track_frames = [(t.total_frames() * 75) // sample_rate
                        for t in title.tracks]
        offsets = [150 + sum(track_frames[0:i])
                   for i in range(len(track_frames))]
        lead_out = 150 + sum(track_frames)
        choices = []
        if options.use_musicbrainz:
            response = musicbrainz.perform_lookup(
                MBDiscID(first_track_number=1,
                         last_track_number=len(track_frames),
                         lead_out_offset=lead_out,
                         offsets=offsets),
                musicbrainz_server=options.musicbrainz_server,
                musicbrainz_port=options.musicbrainz_port)
            if response:
                choices.extend(parse_musicbrainz_xml(
                    response, len(track_frames)))
        if options.use_freedb:
            response = freedb.perform_lookup(
                FreeDBDiscID(offsets=offsets,
                             total_length=sum(track_frames) - 1,
                             track_count=len(track_frames)),
                freedb_server=options.freedb_server,
                freedb_port=options.freedb_port)
            if response:
                parsed = parse_xmcd(response, len(track_frames))
                if parsed is not None:
                    choices.append(parsed)
        choices.append([MetaData(track_number=i + 1,
                                 track_total=len(track_frames))
                        for i in range(len(track_frames))])
        if options.interactive:
            from .. import ui
            if not ui.AVAILABLE:
                ui.not_available_message(msg)
                return 1
            lookup_metadatas = ui.select_metadata(choices, msg)
        else:
            lookup_metadatas = (choices[-1] if options.use_default
                                else choices[0])

    try:
        reader = BufferedPCMReader(title.to_pcm())
    except ValueError as err:
        msg.error(str(err))
        return 1

    # tracks are consecutive PTS windows of the title's PCM stream
    output_filenames = []
    position = 1
    for track in title.tracks:
        frames = track.total_frames()
        if position in track_numbers:
            if (lookup_metadatas is not None and
                    position - 1 < len(lookup_metadatas)):
                track_meta = lookup_metadatas[position - 1]
                track_meta.track_number = (position +
                                           options.track_start - 1)
                track_meta.track_total = (options.track_total or
                                          len(title))
            else:
                track_meta = MetaData(
                    track_number=(position + options.track_start - 1),
                    track_total=(options.track_total or len(title)))
            if options.album_number is not None:
                track_meta.album_number = options.album_number
            if options.album_total is not None:
                track_meta.album_total = options.album_total
            filename = os.path.join(
                options.dir,
                output_class.track_name(
                    file_path="track%2.2d" % (position,),
                    track_metadata=track_meta,
                    format=options.format))
            try:
                new_track = output_class.from_pcm(
                    filename, LimitedPCMReader(reader, frames),
                    compression=options.quality or None)
                new_track.set_metadata(track_meta)
                output_filenames.append(filename)
            except (IOError, ValueError) as err:
                msg.error(str(err))
                return 1
            msg.info(LAB_DVDA_EXTRACTED % {"track": position})
        else:
            remaining = frames
            while remaining > 0:
                fl = reader.read(min(remaining, 65536))
                if fl.frames == 0:
                    break
                remaining -= fl.frames
        position += 1

    if (options.add_replay_gain and
            output_class.supports_replay_gain() and
            output_filenames):
        from .. import text as text_mod
        msg.info(text_mod.RG_ADDING_REPLAYGAIN_WAIT)
        output_class.add_replay_gain(output_filenames)
        msg.info(text_mod.RG_REPLAYGAIN_ADDED)
    return 0


if __name__ == "__main__":
    sys.exit(main())
