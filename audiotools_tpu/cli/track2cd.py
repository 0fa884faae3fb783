"""track2cd: burn audio tracks to a CD-R.

Rebuild of the reference ``track2cd`` tool: converts tracks to a
cue/bin image and invokes the ``cdrdao``/``cdrecord`` binaries to
burn, availability-gated exactly like the reference BINARIES checks.
Without a burner binary it still writes the cue/bin image, which
``cd2track``/``cdinfo`` (and real burners elsewhere) consume.
"""

from __future__ import annotations

import argparse
import os
import shutil
import subprocess
import sys

from . import add_common_arguments
from ..utils.messenger import Messenger
from ..text import (DESC_TRACK2CD, HELP_CDROM, HELP_T2CD_IMAGE,
                    HELP_T2CD_CUESHEET,
                    HELP_SPEED, ERR_1_FILE_REQUIRED,
                    LAB_T2CD_WROTE, ERR_T2CD_NO_BURNER_IMAGE)


def main(argv=None):
    parser = argparse.ArgumentParser(
        prog="track2cd",
        description=DESC_TRACK2CD)
    add_common_arguments(parser)
    parser.add_argument("-c", "--cdrom", dest="cdrom",
                        default="/dev/cdrom", help=HELP_CDROM)
    parser.add_argument("--image", dest="image", default=None,
                        help=HELP_T2CD_IMAGE)
    parser.add_argument("-s", "--speed", dest="speed", type=int,
                        default=20, help=HELP_SPEED)
    parser.add_argument("--cue", dest="cuesheet", default=None,
                        help=HELP_T2CD_CUESHEET)
    parser.add_argument("-j", "--joint", dest="max_processes",
                        type=int, default=None)
    parser.add_argument("filenames", nargs="+")
    options = parser.parse_args(argv)
    msg = Messenger("track2cd", options)

    from ..dispatch import open_files
    from ..pcmstream import PCMConverter
    from fractions import Fraction

    tracks = open_files(options.filenames, messenger=msg)
    if len(tracks) == 0:
        msg.error(ERR_1_FILE_REQUIRED)
        return 1

    # a single album image + --cue burns with the sheet's track
    # boundaries (reference track2cd's cuesheet mode)
    cuesheet = None
    if options.cuesheet is not None:
        from ..audiofile import read_sheet
        from ..sheets.cue import SheetException
        try:
            cuesheet = read_sheet(options.cuesheet)
        except (SheetException, IOError) as err:
            msg.error(str(err))
            return 1

    # without --image the staging cue/bin lives in a temporary
    # directory (removed after the burn attempt) — never in the CWD
    staging_dir = None
    if options.image is not None:
        base = options.image
    else:
        import tempfile
        staging_dir = tempfile.mkdtemp(prefix="track2cd-")
        base = os.path.join(staging_dir, "track2cd_image")
    bin_path = base + ".bin"
    cue_path = base + ".cue"

    # build the image: 44.1kHz/2ch/16-bit PCM, sector-padded tracks.
    # With --cue and a single album image, the sheet's pcm_lengths
    # carve the track boundaries instead of file boundaries.
    def write_track(out, reader):
        if ((reader.sample_rate != 44100) or
                (reader.channels != 2) or
                (reader.bits_per_sample != 16)):
            reader = PCMConverter(reader, 44100, 2, 0x3, 16)
        framelist = reader.read(65536)
        while framelist.frames:
            out.write(framelist.to_bytes(False, True))
            framelist = reader.read(65536)
        out.write(b"\x00" * ((-out.tell()) % 2352))

    offsets = []
    with open(bin_path, "wb") as out:
        if cuesheet is not None and len(tracks) == 1:
            from ..pcmstream import pcm_split
            album = tracks[0]
            lengths = list(cuesheet.pcm_lengths(
                album.total_frames(), album.sample_rate()))
            for sub_reader in pcm_split(album.to_pcm(), lengths):
                offsets.append(out.tell() // 2352)
                write_track(out, sub_reader)
        else:
            for track in tracks:
                offsets.append(out.tell() // 2352)
                reader = track.to_pcm()
                write_track(out, reader)
                reader.close()

    with open(cue_path, "w") as cue:
        cue.write('FILE "%s" BINARY\n' % (os.path.basename(bin_path),))
        for (i, sector) in enumerate(offsets, 1):
            minutes = sector // (75 * 60)
            seconds = (sector // 75) % 60
            frames = sector % 75
            cue.write("  TRACK %2.2d AUDIO\n" % (i,))
            cue.write("    INDEX 01 %2.2d:%2.2d:%2.2d\n" %
                      (minutes, seconds, frames))
    msg.info(LAB_T2CD_WROTE % {"cue": cue_path, "bin": bin_path})

    if options.image is not None:
        return 0

    # burn via cdrdao or cdrecord when present (reference gates the
    # tool on these binaries); the temporary staging image is removed
    # afterwards either way
    try:
        if shutil.which("cdrdao") is not None:
            result = subprocess.run(
                ["cdrdao", "write", "--device", options.cdrom,
                 "--speed", str(options.speed), cue_path])
            return result.returncode
        elif shutil.which("cdrecord") is not None:
            result = subprocess.run(
                ["cdrecord", "-audio", "dev=%s" % (options.cdrom,),
                 "speed=%d" % (options.speed,), bin_path])
            return result.returncode
        else:
            msg.error(ERR_T2CD_NO_BURNER_IMAGE % {"cue": cue_path})
            return 1
    finally:
        if staging_dir is not None:
            shutil.rmtree(staging_dir, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
