"""cd2track: extract audio tracks from a CD (image) to files.

Rebuild of the reference ``cd2track`` tool (reference
``cd2track:265-454``): rips each CDDA track through CDTrackReader
(with optional sample read-offset) into the chosen output format via
the job queue, and reports the disc's AccurateRip ID.  This build
reads cue/toc disc images (the reference's CDImage backend); physical
drives need libcdio hardware support.
"""

from __future__ import annotations

import argparse
import os
import sys

from . import add_common_arguments
from ..utils.messenger import Messenger


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
        description="extract audio tracks from a CD image")
    add_common_arguments(parser)
    parser.add_argument("-c", "--cdrom", dest="cdrom", required=True,
                        help="the CD image to rip (.cue or .toc)")
    parser.add_argument("-t", "--type", dest="type", default="flac")
    parser.add_argument("-q", "--quality", dest="quality", default="")
    parser.add_argument("-d", "--dir", dest="dir", default=".")
    parser.add_argument("--format", dest="format", default=None)
    parser.add_argument("--offset", dest="sample_offset", type=int,
                        default=0,
                        help="drive read offset, in PCM samples")
    parser.add_argument("-j", "--joint", dest="max_processes",
                        type=int, default=None)
    parser.add_argument("--no-musicbrainz", dest="use_musicbrainz",
                        action="store_false", default=True,
                        help="skip the MusicBrainz metadata lookup")
    parser.add_argument("--musicbrainz-server",
                        dest="musicbrainz_server",
                        default="musicbrainz.org")
    parser.add_argument("--no-freedb", dest="use_freedb",
                        action="store_false", default=True,
                        help="skip the FreeDB metadata lookup")
    parser.add_argument("--freedb-server", dest="freedb_server",
                        default="us.freedb.org")
    parser.add_argument("tracks", nargs="*", type=int,
                        help="track numbers to rip (default: all)")

    options = parser.parse_args(argv)
    msg = Messenger("cd2track", options)

    from ..dispatch import TYPE_MAP
    from ..cdio import CDDA
    from ..parallel.queue import ExecProgressQueue
    from ..utils.config import MAX_JOBS
    from ..utils.messenger import ProgressDisplay
    from ..audiofile import MetaData

    if options.type not in TYPE_MAP:
        msg.error("unsupported audio type %r" % (options.type,))
        return 1
    output_class = TYPE_MAP[options.type]
    quality = options.quality or None

    try:
        cdda = CDDA(options.cdrom)
    except (IOError, ValueError) as err:
        msg.error(str(err))
        return 1

    track_numbers = options.tracks or list(
        range(1, len(cdda) + 1))
    for number in track_numbers:
        if not (1 <= number <= len(cdda)):
            msg.error("track %d not found on disc" % (number,))
            return 1

    msg.info("AccurateRip disc ID: %s" %
             (str(cdda.accuraterip_disc_id()),))

    # service lookup (reference cd2track:338-365): the first
    # returned choice wins non-interactively; the final choice is
    # always the track-numbers-only default, so this degrades
    # cleanly offline
    from ..services.lookup import metadata_lookup
    choices = metadata_lookup(
        cdda,
        musicbrainz_server=options.musicbrainz_server,
        freedb_server=options.freedb_server,
        use_musicbrainz=options.use_musicbrainz,
        use_freedb=options.use_freedb)
    disc_metadata = choices[0]
    if len(choices) > 1:
        album = disc_metadata[0].album_name
        msg.info("Using metadata: %s" % (album or "(untitled)",))

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
            progress_text="track %d" % (number,),
            completion_output="ripped track %d" % (number,),
            cdda_path=options.cdrom,
            track_number=number,
            sample_offset=options.sample_offset,
            output_class=output_class,
            output_filename=filename,
            quality=quality,
            metadata=track_metadata)
    cdda.close()

    try:
        queue.run(options.max_processes or MAX_JOBS())
    except (IOError, ValueError) as err:
        msg.error(str(err))
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
