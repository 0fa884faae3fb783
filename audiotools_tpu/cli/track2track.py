"""track2track: batch audio format conversion.

Rebuild of the reference flagship tool (``/root/reference/track2track``):
-t/-q output type and quality, -o single output or -d directory with
--format templates, -j parallel jobs, sample rate / channel / bps
conversion triggers (track2track:49-70), and the album ReplayGain
post-pass (track2track:674-718).
"""

from __future__ import annotations

import argparse
import os
import sys

from . import (audiofile_type, default_type,
               add_common_arguments, add_lookup_arguments)
from ..utils.messenger import Messenger, ProgressDisplay
from ..utils.config import MAX_JOBS, FILENAME_FORMAT
from ..parallel.queue import ExecProgressQueue, ExecQueueError
from ..text import (DESC_TRACK2TRACK, HELP_TYPE, HELP_QUALITY,
                    HELP_DIR, HELP_FORMAT, HELP_OUTPUT, HELP_JOINT,
                    HELP_REPLAY_GAIN, HELP_NO_REPLAY_GAIN,
                    HELP_METADATA_LOOKUP, HELP_USE_DEFAULT,
                    HELP_INTERACTIVE, HELP_DEVICES, HELP_SAMPLE_RATE,
                    HELP_CHANNELS, HELP_BITS_PER_SAMPLE,
                    ERR_UNSUPPORTED_COMPRESSION, ERR_1_FILE_REQUIRED,
                    ERR_ONE_OUTPUT_FILE, ERR_OUTPUT_IS_INPUT,
                    ERR_OUTPUT_DUPLICATE_NAME, ERR_MAKEDIRS,
                    LAB_T2T_USING_METADATA, LAB_UNTITLED,
                    LAB_T2T_CONVERTED)
from .. import text


def convert(destination_filename, destination_class, compression,
            metadata, source_filename, sample_rate=None, channels=None,
            channel_mask=None, bits_per_sample=None, progress=None):
    """converts a single track (runs inside a job process)"""
    from ..dispatch import open as open_track
    from ..pcmstream import PCMConverter, to_pcm_progress

    source_audiofile = open_track(source_filename)

    if (sample_rate is None and channels is None and
            bits_per_sample is None):
        destination_audiofile = source_audiofile.convert(
            destination_filename, destination_class, compression,
            progress)
    else:
        pcmreader = to_pcm_progress(source_audiofile, progress)
        pcmreader = PCMConverter(
            pcmreader,
            sample_rate or pcmreader.sample_rate,
            channels or pcmreader.channels,
            (channel_mask if channel_mask is not None
             else (pcmreader.channel_mask if channels is None else 0)),
            bits_per_sample or pcmreader.bits_per_sample)
        destination_audiofile = destination_class.from_pcm(
            destination_filename, pcmreader, compression)

    if metadata is not None:
        destination_audiofile.set_metadata(metadata)

    return destination_filename


def main(argv=None):
    parser = argparse.ArgumentParser(
        prog="track2track",
        description=DESC_TRACK2TRACK)
    add_common_arguments(parser)
    parser.add_argument("-t", "--type", dest="type", help=HELP_TYPE)
    parser.add_argument("-q", "--quality", dest="quality", default="",
                        help=HELP_QUALITY)
    parser.add_argument("-d", "--dir", dest="dir", default=".",
                        help=HELP_DIR)
    parser.add_argument("--format", dest="format", default=None,
                        help=HELP_FORMAT)
    parser.add_argument("-o", "--output", dest="output", default=None,
                        help=HELP_OUTPUT)
    parser.add_argument("-j", "--joint", dest="max_processes",
                        type=int, default=None, help=HELP_JOINT)
    parser.add_argument("-I", "--interactive", action="store_true",
                        default=False, dest="interactive",
                        help=HELP_INTERACTIVE)
    parser.add_argument("--replay-gain", action="store_true",
                        dest="add_replay_gain", default=False,
                        help=HELP_REPLAY_GAIN)
    parser.add_argument("--no-replay-gain", action="store_false",
                        dest="add_replay_gain",
                        help=HELP_NO_REPLAY_GAIN)
    add_lookup_arguments(parser)
    parser.add_argument("--devices", type=int, default=None,
                        help=HELP_DEVICES)
    parser.add_argument("--sample-rate", type=int, default=None,
                        help=HELP_SAMPLE_RATE)
    parser.add_argument("--channels", type=int, default=None,
                        help=HELP_CHANNELS)
    parser.add_argument("--bits-per-sample", type=int, default=None,
                        help=HELP_BITS_PER_SAMPLE)
    parser.add_argument("filenames", nargs="+")

    options = parser.parse_args(argv)
    msg = Messenger("track2track", options)

    from ..dispatch import open_files
    from ..audiofile import AudioFile

    if options.type is None:
        options.type = default_type()
    destination_class = audiofile_type(msg, options.type)
    if destination_class is None:
        return 1

    if (options.quality and
            options.quality not in destination_class.COMPRESSION_MODES):
        msg.error(ERR_UNSUPPORTED_COMPRESSION %
                  {"quality": options.quality, "type": options.type})
        return 1
    compression = options.quality or None

    audiofiles = open_files(options.filenames, messenger=msg)
    if len(audiofiles) == 0:
        msg.error(ERR_1_FILE_REQUIRED)
        return 1

    if options.output is not None:
        if len(audiofiles) != 1:
            msg.error(ERR_ONE_OUTPUT_FILE)
            return 1
        track = audiofiles[0]
        try:
            convert(options.output, destination_class, compression,
                    track.get_metadata(), track.filename,
                    options.sample_rate, options.channels, None,
                    options.bits_per_sample)
        except Exception as err:
            msg.error(str(err))
            return 1
        return 0

    # album-wide metadata lookup (reference track2track:461-530):
    # the input files are treated as one CD; the first service
    # choice wins non-interactively (-D forces the blank default),
    # and existing track metadata fills any gaps
    lookup_metadata = None
    if options.metadata_lookup:
        from ..services.lookup import track_metadata_lookup
        choices = track_metadata_lookup(
            audiofiles,
            musicbrainz_server=options.musicbrainz_server,
            musicbrainz_port=options.musicbrainz_port,
            freedb_server=options.freedb_server,
            freedb_port=options.freedb_port,
            use_musicbrainz=options.use_musicbrainz,
            use_freedb=options.use_freedb)
        chosen = choices[-1] if options.use_default else choices[0]
        from ..dispatch import sorted_tracks as _sort
        lookup_metadata = dict(zip(
            (t.filename for t in _sort(audiofiles)), chosen))
        if len(choices) > 1 and not options.use_default:
            msg.info(LAB_T2T_USING_METADATA %
                     {"album": chosen[0].album_name or LAB_UNTITLED})

    track_metadatas = []
    for track in audiofiles:
        metadata = track.get_metadata()
        if lookup_metadata is not None:
            looked_up = lookup_metadata.get(track.filename)
            if looked_up is not None:
                if metadata is not None:
                    # keep existing fields, fill blanks from lookup
                    for field in looked_up.FIELDS:
                        if getattr(metadata, field) is None:
                            setattr(metadata, field,
                                    getattr(looked_up, field))
                else:
                    metadata = looked_up
        track_metadatas.append(metadata)

    # interactive mode: the OutputFiller wizard edits metadata and
    # output parameters before conversion (reference track2track's
    # -I flow over audiotools/ui.py:89)
    output_specs = None
    if options.interactive:
        from .. import ui
        if not ui.AVAILABLE:
            ui.not_available_message(msg)
            return 1
        import urwid
        from ..dispatch import Filename
        from ..audiofile import MetaData as MD
        filler = ui.OutputFiller(
            track_labels=[str(t.filename) for t in audiofiles],
            metadata_choices=[[m if m is not None else MD()
                               for m in track_metadatas]],
            input_filenames=[Filename(t.filename)
                             for t in audiofiles],
            output_directory=options.dir,
            format_string=options.format or FILENAME_FORMAT,
            output_class=destination_class,
            quality=options.quality)
        urwid.MainLoop(filler, ui.urwid_style(),
                       unhandled_input=filler.handle_text).run()
        if filler.cancelled():
            return 0
        output_specs = [(cls, str(path), qual, metadata)
                        for (cls, path, qual, metadata)
                        in filler.output_tracks()]

    progress_display = ProgressDisplay(msg)
    queue = ExecProgressQueue(progress_display)
    output_filenames = []

    for (i, track) in enumerate(audiofiles):
        if output_specs is not None:
            (destination_class, destination,
             quality, metadata) = output_specs[i]
            compression = quality or None
        else:
            metadata = track_metadatas[i]
            filename = AudioFile.track_name(
                track.filename, metadata,
                options.format or FILENAME_FORMAT,
                suffix=destination_class.SUFFIX)
            destination = os.path.join(options.dir, filename)
        if os.path.abspath(destination) == \
                os.path.abspath(track.filename):
            msg.error(ERR_OUTPUT_IS_INPUT %
                      {"filename": destination})
            return 1
        if destination in output_filenames:
            msg.error(ERR_OUTPUT_DUPLICATE_NAME)
            return 1
        try:
            os.makedirs(os.path.dirname(destination) or ".",
                        exist_ok=True)
        except OSError as err:
            msg.error(ERR_MAKEDIRS %
                      {"filename": destination,
                       "error": err.strerror or err})
            return 1
        output_filenames.append(destination)
        queue.execute(
            convert,
            progress_text=destination,
            completion_output=(LAB_T2T_CONVERTED %
                               {"source": track.filename,
                                "destination": destination}),
            destination_filename=destination,
            destination_class=destination_class,
            compression=compression,
            metadata=metadata,
            source_filename=track.filename,
            sample_rate=options.sample_rate,
            channels=options.channels,
            bits_per_sample=options.bits_per_sample)

    try:
        if options.devices:
            # the device mesh replaces process parallelism: frames
            # shard over the accelerators inside each encode
            import os as os_mod
            os_mod.environ["ATPU_DEVICES"] = str(options.devices)
        queue.run(options.max_processes or MAX_JOBS())
    except (ExecQueueError, IOError, ValueError) as err:
        msg.error(str(err))
        return 1

    if (options.add_replay_gain and
            destination_class.supports_replay_gain()):
        from ..dispatch import open_files as reopen
        msg.info(text.RG_ADDING_REPLAYGAIN_WAIT)
        try:
            destination_class.add_replay_gain(output_filenames)
        except (ValueError, IOError) as err:
            msg.error(str(err))
            return 1
        msg.info(text.RG_REPLAYGAIN_ADDED)

    return 0


if __name__ == "__main__":
    sys.exit(main())
