"""cd2track: extract audio tracks from a CD (image) to files.

Rebuild of the reference ``cd2track`` tool (reference
``cd2track:265-454``): rips each CDDA track through CDTrackReader
(with optional sample read-offset) into the chosen output format via
the job queue, and reports the disc's AccurateRip ID.  This build
reads cue/toc disc images (the reference's CDImage backend); physical
drives need libcdio hardware support.
"""

from __future__ import annotations

from .. import text

import argparse
import os
import sys

from . import add_common_arguments
from ..utils.messenger import Messenger
from ..text import (DESC_CD2TRACK, HELP_CDROM, HELP_TYPE,
                    HELP_QUALITY, HELP_DIR, HELP_FORMAT, HELP_JOINT,
                    HELP_NO_MUSICBRAINZ, HELP_MUSICBRAINZ_SERVER,
                    HELP_NO_FREEDB, HELP_FREEDB_SERVER,
                    HELP_INTERACTIVE, ERR_UNSUPPORTED_TYPE,
                    ERR_TRACK_NOT_FOUND, LAB_ACCURATERIP_DISC_ID,
                    LAB_USING_METADATA, LAB_UNTITLED,
                    LAB_TRACK_PROGRESS, LAB_RIPPED_TRACK)


def _rip_track(cdda_path, track_number, sample_offset, output_class,
               output_filename, quality, metadata=None, progress=None):
    from ..cdio import CDDA, CDTrackReader
    from ..pcmstream import PCMReaderProgress

    cdda = CDDA(cdda_path)
    reader = CDTrackReader(cdda.cdda, track_number, sample_offset)
    if progress is not None:
        reader = PCMReaderProgress(
            reader, reader.__total_frames__, progress)
    track = output_class.from_pcm(output_filename, reader,
                                  compression=quality)
    if metadata is not None:
        track.set_metadata(metadata)
    cdda.close()
    return output_filename


def main(argv=None):
    parser = argparse.ArgumentParser(
        prog="cd2track",
        description=DESC_CD2TRACK)
    add_common_arguments(parser)
    parser.add_argument("-c", "--cdrom", dest="cdrom", required=True,
                        help=HELP_CDROM)
    parser.add_argument("-t", "--type", dest="type", default="flac",
                        help=HELP_TYPE)
    parser.add_argument("-q", "--quality", dest="quality", default="",
                        help=HELP_QUALITY)
    parser.add_argument("-d", "--dir", dest="dir", default=".",
                        help=HELP_DIR)
    parser.add_argument("--format", dest="format", default=None,
                        help=HELP_FORMAT)
    parser.add_argument("--offset", dest="sample_offset", type=int,
                        default=0,
                        help=text.HELP_READ_OFFSET)
    parser.add_argument("-j", "--joint", dest="max_processes",
                        type=int, default=None, help=HELP_JOINT)
    parser.add_argument("-I", "--interactive", action="store_true",
                        default=False, dest="interactive",
                        help=HELP_INTERACTIVE)
    parser.add_argument("--no-musicbrainz", dest="use_musicbrainz",
                        action="store_false", default=True,
                        help=HELP_NO_MUSICBRAINZ)
    parser.add_argument("--musicbrainz-server",
                        dest="musicbrainz_server",
                        default="musicbrainz.org",
                        help=HELP_MUSICBRAINZ_SERVER)
    parser.add_argument("--musicbrainz-port", type=int,
                        dest="musicbrainz_port", default=80)
    parser.add_argument("--no-freedb", dest="use_freedb",
                        action="store_false", default=True,
                        help=HELP_NO_FREEDB)
    parser.add_argument("--freedb-server", dest="freedb_server",
                        default="us.freedb.org",
                        help=HELP_FREEDB_SERVER)
    parser.add_argument("--freedb-port", type=int,
                        dest="freedb_port", default=80)
    parser.add_argument("-D", "--default", dest="use_default",
                        action="store_true", default=False)
    parser.add_argument("-M", "--metadata-lookup",
                        action="store_true", default=False,
                        dest="metadata_lookup")
    parser.add_argument("-s", "--speed", dest="speed", type=int,
                        default=None, help=text.HELP_READ_SPEED)
    parser.add_argument("--album-number", type=int,
                        dest="album_number", default=None)
    parser.add_argument("--album-total", type=int,
                        dest="album_total", default=None)
    parser.add_argument("--replay-gain", action="store_true",
                        dest="add_replay_gain", default=False)
    parser.add_argument("--no-replay-gain", action="store_false",
                        dest="add_replay_gain")
    parser.add_argument("tracks", nargs="*", type=int,
                        help=text.HELP_CD_TRACKS)

    options = parser.parse_args(argv)
    msg = Messenger("cd2track", options)

    from ..dispatch import TYPE_MAP
    from ..cdio import CDDA
    from ..parallel.queue import ExecProgressQueue
    from ..utils.config import MAX_JOBS
    from ..utils.messenger import ProgressDisplay
    from ..audiofile import MetaData

    if options.type not in TYPE_MAP:
        msg.error(ERR_UNSUPPORTED_TYPE % {"type": options.type})
        return 1
    output_class = TYPE_MAP[options.type]
    quality = options.quality or None

    try:
        cdda = CDDA(options.cdrom)
    except (IOError, ValueError) as err:
        msg.error(str(err))
        return 1
    if options.speed is not None:
        # image-backed CDDA has no drive speed; delegate when the
        # underlying backend supports it (physical drives)
        set_speed = getattr(cdda, "set_speed",
                            getattr(getattr(cdda, "cdda", None),
                                    "set_speed", None))
        if set_speed is not None:
            set_speed(options.speed)

    track_numbers = options.tracks or list(
        range(1, len(cdda) + 1))
    for number in track_numbers:
        if not (1 <= number <= len(cdda)):
            msg.error(ERR_TRACK_NOT_FOUND % {"track": number})
            return 1

    msg.info(LAB_ACCURATERIP_DISC_ID %
             {"id": str(cdda.accuraterip_disc_id())})

    # service lookup (reference cd2track:338-365): the first
    # returned choice wins non-interactively; the final choice is
    # always the track-numbers-only default, so this degrades
    # cleanly offline
    from ..services.lookup import metadata_lookup
    if options.metadata_lookup:
        choices = metadata_lookup(
            cdda,
            musicbrainz_server=options.musicbrainz_server,
            musicbrainz_port=options.musicbrainz_port,
            freedb_server=options.freedb_server,
            freedb_port=options.freedb_port,
            use_musicbrainz=options.use_musicbrainz,
            use_freedb=options.use_freedb)
    else:
        from ..audiofile import MetaData as _MD
        choices = [[_MD(track_number=i + 1, track_total=len(cdda))
                    for i in range(len(cdda))]]
    disc_metadata = choices[-1] if options.use_default else choices[0]
    if options.album_number is not None:
        for metadata in disc_metadata:
            metadata.album_number = options.album_number
    if options.album_total is not None:
        for metadata in disc_metadata:
            metadata.album_total = options.album_total

    # interactive mode: choose among service matches and edit the
    # winner in the MetaDataFiller swivel editor (reference
    # cd2track's -I flow over audiotools/ui.py:353)
    if options.interactive:
        from .. import ui
        if not ui.AVAILABLE:
            ui.not_available_message(msg)
            return 1
        import urwid
        status = urwid.Text("")
        filler = ui.MetaDataFiller(
            ["track %d" % (i + 1,) for i in range(len(cdda))],
            choices, status)
        accepted = {"done": False}

        def unhandled(key):
            if key == "f1":
                filler.select_previous_item()
            elif key == "f2":
                filler.select_next_item()
            elif key == "enter":
                accepted["done"] = True
                raise urwid.ExitMainLoop()
            elif key == "esc":
                raise urwid.ExitMainLoop()

        urwid.MainLoop(urwid.Frame(body=filler, footer=status),
                       ui.urwid_style(),
                       unhandled_input=unhandled).run()
        if not accepted["done"]:
            return 0
        disc_metadata = list(filler.populated_metadata())
    elif len(choices) > 1:
        album = disc_metadata[0].album_name
        msg.info(LAB_USING_METADATA %
                 {"album": album or LAB_UNTITLED})

    os.makedirs(options.dir, exist_ok=True)
    queue = ExecProgressQueue(ProgressDisplay(msg))
    total = len(cdda)
    for number in track_numbers:
        try:
            track_metadata = disc_metadata[number - 1]
        except IndexError:
            track_metadata = MetaData(track_number=number,
                                      track_total=total)
        filename = os.path.join(
            options.dir,
            output_class.track_name(
                file_path="track%2.2d" % (number,),
                track_metadata=track_metadata,
                format=options.format))
        queue.execute(
            _rip_track,
            progress_text=LAB_TRACK_PROGRESS % {"track": number},
            completion_output=LAB_RIPPED_TRACK % {"track": number},
            cdda_path=options.cdrom,
            track_number=number,
            sample_offset=options.sample_offset,
            output_class=output_class,
            output_filename=filename,
            quality=quality,
            metadata=track_metadata)
    cdda.close()

    try:
        results = queue.run(options.max_processes or MAX_JOBS())
    except (IOError, ValueError) as err:
        msg.error(str(err))
        return 1

    if (options.add_replay_gain and
            output_class.supports_replay_gain() and results):
        msg.info(text.RG_ADDING_REPLAYGAIN_WAIT)
        output_class.add_replay_gain(
            [r for r in results if isinstance(r, str)])
        msg.info(text.RG_REPLAYGAIN_ADDED)
    return 0


if __name__ == "__main__":
    sys.exit(main())
