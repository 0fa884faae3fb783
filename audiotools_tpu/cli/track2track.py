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

from . import audiofile_type, default_type, add_common_arguments
from ..utils.messenger import Messenger, ProgressDisplay
from ..utils.config import MAX_JOBS, FILENAME_FORMAT
from ..parallel.queue import ExecProgressQueue, ExecQueueError


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
        description="convert audio files from one format to another")
    add_common_arguments(parser)
    parser.add_argument("-t", "--type", dest="type",
                        help="the audio type to convert to")
    parser.add_argument("-q", "--quality", dest="quality", default="",
                        help="the quality to store audio at")
    parser.add_argument("-d", "--dir", dest="dir", default=".",
                        help="the directory to store converted files")
    parser.add_argument("--format", dest="format", default=None,
                        help="the format string for new filenames")
    parser.add_argument("-o", "--output", dest="output", default=None,
                        help="an output file (single input only)")
    parser.add_argument("-j", "--joint", dest="max_processes",
                        type=int, default=None,
                        help="the maximum number of parallel jobs")
    parser.add_argument("--replay-gain", action="store_true",
                        dest="add_replay_gain", default=False,
                        help="add ReplayGain metadata to output files")
    parser.add_argument("--no-replay-gain", action="store_false",
                        dest="add_replay_gain",
                        help="do not add ReplayGain metadata")
    parser.add_argument("-M", "--metadata-lookup",
                        action="store_true", default=False,
                        dest="metadata_lookup",
                        help="treat the input files as one album and "
                             "look up metadata from online services")
    parser.add_argument("--no-musicbrainz", dest="use_musicbrainz",
                        action="store_false", default=True)
    parser.add_argument("--musicbrainz-server",
                        dest="musicbrainz_server",
                        default="musicbrainz.org")
    parser.add_argument("--no-freedb", dest="use_freedb",
                        action="store_false", default=True)
    parser.add_argument("--freedb-server", dest="freedb_server",
                        default="us.freedb.org")
    parser.add_argument("-D", "--default", dest="use_default",
                        action="store_true", default=False,
                        help="with -M, use the default blank choice "
                             "instead of the first service match")
    parser.add_argument("--devices", type=int, default=None,
                        help="shard encode batches over N accelerator "
                             "devices (data-parallel frames on a Mesh)")
    parser.add_argument("--sample-rate", type=int, default=None)
    parser.add_argument("--channels", type=int, default=None)
    parser.add_argument("--bits-per-sample", type=int, default=None)
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
        msg.error("\"%s\" is not a supported compression mode "
                  "for type \"%s\"" %
                  (options.quality, options.type))
        return 1
    compression = options.quality or None

    audiofiles = open_files(options.filenames, messenger=msg)
    if len(audiofiles) == 0:
        msg.error("you must specify at least 1 supported audio file")
        return 1

    if options.output is not None:
        if len(audiofiles) != 1:
            msg.error("you may specify only 1 input file for use "
                      "with -o")
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
            freedb_server=options.freedb_server,
            use_musicbrainz=options.use_musicbrainz,
            use_freedb=options.use_freedb)
        chosen = choices[-1] if options.use_default else choices[0]
        from ..dispatch import sorted_tracks as _sort
        lookup_metadata = dict(zip(
            (t.filename for t in _sort(audiofiles)), chosen))
        if len(choices) > 1 and not options.use_default:
            msg.info("Using metadata: %s" %
                     (chosen[0].album_name or "(untitled)",))

    progress_display = ProgressDisplay(msg)
    queue = ExecProgressQueue(progress_display)
    output_filenames = []

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
        filename = AudioFile.track_name(
            track.filename, metadata,
            options.format or FILENAME_FORMAT,
            suffix=destination_class.SUFFIX)
        destination = os.path.join(options.dir, filename)
        if os.path.abspath(destination) == \
                os.path.abspath(track.filename):
            msg.error("\"%s\" cannot be both input and output file" %
                      (destination,))
            return 1
        if destination in output_filenames:
            msg.error("output file \"%s\" occurs more than once; "
                      "use --format with distinguishing fields" %
                      (destination,))
            return 1
        try:
            os.makedirs(os.path.dirname(destination) or ".",
                        exist_ok=True)
        except OSError as err:
            msg.error("unable to create directory for \"%s\": %s" %
                      (destination, err.strerror or err))
            return 1
        output_filenames.append(destination)
        queue.execute(
            convert,
            progress_text=destination,
            completion_output="%s -> %s" % (track.filename,
                                            destination),
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
        msg.info("Adding ReplayGain metadata...")
        try:
            destination_class.add_replay_gain(output_filenames)
        except (ValueError, IOError) as err:
            msg.error(str(err))
            return 1

    return 0


if __name__ == "__main__":
    sys.exit(main())
