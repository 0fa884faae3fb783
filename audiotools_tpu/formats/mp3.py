"""MP3 / MP2 format support.

Rebuild of the reference ``/root/reference/audiotools/mp3.py`` (822
LoC): MPEG audio files with ID3v2/ID3v1 metadata, decode via
libmpg123, encode via libmp3lame (MP3, VBR -V levels) and libtwolame
(MP2, CBR bitrates), stream verification via the native MPEG frame
walker (role of ``src/verify/mpeg.c``).  Availability is gated on the
system libraries like the reference's ``BINARIES`` checks.
"""

from __future__ import annotations

from .. import text

import os

import numpy as np

from ..audiofile import AudioFile, MetaData
from ..pcmstream import ChannelMask, BufferedPCMReader, PCMReaderError
from .. import _native


class InvalidMP3(Exception):
    pass


def _strip_tags(data):
    """returns (audio bytes, leading tag size) without ID3v2/ID3v1"""
    start = 0
    while (len(data) - start >= 10 and
           data[start:start + 3] == b"ID3" and
           data[start + 3] in (2, 3, 4)):
        size = 0
        for b in data[start + 6:start + 10]:
            size = (size << 7) | (b & 0x7F)
        start += 10 + size
    end = len(data)
    if end - start >= 128 and data[end - 128:end - 125] == b"TAG":
        end -= 128
    return (data[start:end], start)


class MP3Audio(AudioFile):
    """an MP3 audio file (reference mp3.py:35)"""

    SUFFIX = "mp3"
    NAME = SUFFIX
    DESCRIPTION = "MPEG-1 Audio Layer III"
    DEFAULT_COMPRESSION = "2"
    COMPRESSION_MODES = tuple(map(str, range(0, 10)))
    COMPRESSION_DESCRIPTIONS = {"0": text.COMP_LAME_0,
                                "9": text.COMP_LAME_9}

    def __init__(self, filename):
        AudioFile.__init__(self, filename)
        try:
            with open(filename, "rb") as f:
                from ..meta.id3 import skip_id3v2_comment
                skip_id3v2_comment(f)
                header = f.read(4)
        except IOError as err:
            raise InvalidMP3(str(err))
        info = _parse_first_frame(header)
        if info is None:
            raise InvalidMP3("invalid MPEG frame header")
        (self.__sample_rate__, self.__channels__,
         self.__layer__) = info
        self.__total_frames__ = None

    @classmethod
    def available(cls, system_binaries=None):
        from ..codecs.mpeg import mpg123_lib, lame_lib
        return (mpg123_lib() is not None) and (lame_lib() is not None)

    def lossless(self):
        return False

    def bits_per_sample(self):
        return 16

    def channels(self):
        return self.__channels__

    def channel_mask(self):
        return ChannelMask(0x3 if self.__channels__ == 2 else 0x4)

    def sample_rate(self):
        return self.__sample_rate__

    def total_frames(self):
        if self.__total_frames__ is None:
            try:
                with open(self.filename, "rb") as f:
                    (_frames, samples, _sr, _ch,
                     _layer) = _native.verify_mpeg(f.read())
                self.__total_frames__ = samples
            except (IOError, ValueError):
                self.__total_frames__ = 0
        return self.__total_frames__

    def seekable(self):
        return False

    # ---- metadata -------------------------------------------------------

    def get_metadata(self):
        """returns ID3CommentPair / ID3v2 / ID3v1 metadata or None"""
        from ..meta.id3 import read_id3v2_comment, ID3CommentPair
        from ..meta.id3v1 import ID3v1Comment
        id3v2 = None
        id3v1 = None
        with open(self.filename, "rb") as f:
            try:
                id3v2 = read_id3v2_comment(f)
            except ValueError:
                pass
            try:
                id3v1 = ID3v1Comment.parse(f)
            except (IOError, ValueError):
                pass
        if id3v2 is not None and id3v1 is not None:
            return ID3CommentPair(id3v2, id3v1)
        return id3v2 if id3v2 is not None else id3v1

    def update_metadata(self, metadata):
        """writes the ID3 metadata object(s) back to the file"""
        from ..meta.id3 import (ID3CommentPair, ID3v22Comment,
                                ID3v23Comment, ID3v24Comment)
        from ..meta.id3v1 import ID3v1Comment
        from ..bitstream import BitstreamWriter
        from ..utils.files import TemporaryFile

        if metadata is None:
            return
        if not isinstance(metadata, (ID3CommentPair, ID3v22Comment,
                                     ID3v23Comment, ID3v24Comment,
                                     ID3v1Comment)):
            raise ValueError("metadata must be ID3 metadata")

        with open(self.filename, "rb") as f:
            (audio, _lead) = _strip_tags(f.read())
        new_file = TemporaryFile(self.filename)
        if isinstance(metadata, ID3CommentPair):
            writer = BitstreamWriter(new_file, False)
            metadata.id3v2.build(writer)
            writer.flush()
            new_file.write(audio)
            metadata.id3v1.build(new_file)
        elif isinstance(metadata, ID3v1Comment):
            new_file.write(audio)
            metadata.build(new_file)
        else:
            writer = BitstreamWriter(new_file, False)
            metadata.build(writer)
            writer.flush()
            new_file.write(audio)
        new_file.close()

    def set_metadata(self, metadata):
        """converts and writes a MetaData object (ID3CommentPair of
        ID3v2.3 + ID3v1, like the reference default)"""
        from ..meta.id3 import ID3CommentPair
        if metadata is None:
            return
        self.update_metadata(ID3CommentPair.converted(metadata))

    def delete_metadata(self):
        from ..utils.files import TemporaryFile
        with open(self.filename, "rb") as f:
            (audio, _lead) = _strip_tags(f.read())
        new_file = TemporaryFile(self.filename)
        new_file.write(audio)
        new_file.close()

    # ---- audio ----------------------------------------------------------

    def to_pcm(self):
        from ..codecs.mpeg import MP3Decoder
        try:
            return MP3Decoder(self.filename)
        except ValueError as err:
            return PCMReaderError(str(err), self.sample_rate(),
                                  self.channels(),
                                  int(self.channel_mask()), 16)

    @classmethod
    def from_pcm(cls, filename, pcmreader, compression=None,
                 total_pcm_frames=None):
        from .. import EncodingError
        from ..codecs.mpeg import encode_mp3
        from ..utils.config import default_quality

        if (compression is None or
                compression not in cls.COMPRESSION_MODES):
            compression = default_quality(cls.NAME) or \
                cls.DEFAULT_COMPRESSION

        try:
            encode_mp3(filename,
                       BufferedPCMReader(
                           _to_16bit_stereo(pcmreader)),
                       compression)
        except (ValueError, IOError) as err:
            raise EncodingError(str(err))
        return cls(filename)

    # header-bit lookup tables (MPEG audio spec): indexed by the raw
    # 2-bit mpeg_id / 2-bit layer / 4-bit bit_rate / 2-bit sample_rate
    # header fields (None marks reserved values)
    SAMPLE_RATE = {0: (11025, 12000, 8000, None),     # MPEG-2.5
                   1: (None, None, None, None),       # reserved
                   2: (22050, 24000, 16000, None),    # MPEG-2
                   3: (44100, 48000, 32000, None)}    # MPEG-1
    BIT_RATE = {
        3: {  # MPEG-1
            3: (None, 32000, 64000, 96000, 128000, 160000, 192000,
                224000, 256000, 288000, 320000, 352000, 384000,
                416000, 448000, None),               # layer I
            2: (None, 32000, 48000, 56000, 64000, 80000, 96000,
                112000, 128000, 160000, 192000, 224000, 256000,
                320000, 384000, None),               # layer II
            1: (None, 32000, 40000, 48000, 56000, 64000, 80000,
                96000, 112000, 128000, 160000, 192000, 224000,
                256000, 320000, None)},              # layer III
        2: {  # MPEG-2
            3: (None, 32000, 48000, 56000, 64000, 80000, 96000,
                112000, 128000, 144000, 160000, 176000, 192000,
                224000, 256000, None),
            2: (None, 8000, 16000, 24000, 32000, 40000, 48000,
                56000, 64000, 80000, 96000, 112000, 128000,
                144000, 160000, None),
            1: (None, 8000, 16000, 24000, 32000, 40000, 48000,
                56000, 64000, 80000, 96000, 112000, 128000,
                144000, 160000, None)}}
    BIT_RATE[0] = BIT_RATE[2]                         # MPEG-2.5

    def frame_length(self, mpeg_id, layer, bit_rate, sample_rate,
                     pad):
        """returns the total MPEG frame length in bytes from the raw
        header bit values (reference mp3.py:573)"""
        sample_rate = self.SAMPLE_RATE[mpeg_id][sample_rate]
        if sample_rate is None:
            raise ValueError("invalid sample rate")
        bit_rate = self.BIT_RATE[mpeg_id][layer][bit_rate]
        if bit_rate is None:
            raise ValueError("invalid bit rate")
        if layer == 3:                                # layer I
            return (((12 * bit_rate) // sample_rate) + pad) * 4
        return ((144 * bit_rate) // sample_rate) + pad

    def verify(self, progress=None):
        """frame-walks the MPEG stream; raises InvalidFile on error"""
        from .. import InvalidFile
        try:
            with open(self.filename, "rb") as f:
                _native.verify_mpeg(f.read())
        except (IOError, ValueError) as err:
            raise InvalidFile(str(err))
        return True

    # ---- ReplayGain via the mp3gain binary (reference mp3.py:59,
    # :595-628): binary-gated exactly like the reference — the gain
    # is applied by rewriting the stream's global gain fields, so the
    # operation is NOT lossless
    REPLAYGAIN_BINARIES = ("mp3gain",)

    @classmethod
    def supports_replay_gain(cls):
        return True

    @classmethod
    def lossless_replay_gain(cls):
        return False

    @classmethod
    def can_add_replay_gain(cls, audiofiles):
        from ..utils.config import BIN
        if not all(isinstance(f, MP3Audio) for f in audiofiles):
            return False
        return BIN.can_execute(BIN["mp3gain"])

    @classmethod
    def add_replay_gain(cls, filenames, progress=None):
        """applies ReplayGain with the mp3gain binary (no-op when the
        binary is absent, like the reference)"""
        import subprocess
        from ..utils.config import BIN
        from ..dispatch import open_files

        track_names = [track.filename for track in
                       open_files(filenames)
                       if isinstance(track, cls)]
        if progress is not None:
            progress(0, 1)
        if track_names and BIN.can_execute(BIN["mp3gain"]):
            with open(os.devnull, "ab") as devnull:
                subprocess.run(
                    [BIN["mp3gain"], "-f", "-k", "-q", "-r"] +
                    track_names,
                    stdout=devnull, stderr=devnull)
        if progress is not None:
            progress(1, 1)


class MP2Audio(MP3Audio):
    """an MP2 audio file (reference mp3.py:712)"""

    SUFFIX = "mp2"
    NAME = SUFFIX
    DESCRIPTION = "MPEG-1 Audio Layer II"
    DEFAULT_COMPRESSION = str(192)
    COMPRESSION_MODES = tuple(map(str, (64, 96, 112, 128, 160, 192,
                                        224, 256, 320, 384)))
    COMPRESSION_DESCRIPTIONS = {"64": text.COMP_TWOLAME_64,
                                "384": text.COMP_TWOLAME_384}

    @classmethod
    def available(cls, system_binaries=None):
        from ..codecs.mpeg import mpg123_lib, twolame_lib
        return ((mpg123_lib() is not None) and
                (twolame_lib() is not None))

    @classmethod
    def from_pcm(cls, filename, pcmreader, compression=None,
                 total_pcm_frames=None):
        from .. import EncodingError
        from ..codecs.mpeg import encode_mp2
        from ..utils.config import default_quality

        if (compression is None or
                compression not in cls.COMPRESSION_MODES):
            compression = default_quality(cls.NAME) or \
                cls.DEFAULT_COMPRESSION
        try:
            encode_mp2(filename,
                       BufferedPCMReader(
                           _to_16bit_stereo(pcmreader)),
                       compression)
        except (ValueError, IOError) as err:
            raise EncodingError(str(err))
        return cls(filename)


def _parse_first_frame(header):
    """parses a 4-byte MPEG frame header; returns
    (sample_rate, channels, layer) or None"""
    if len(header) < 4 or header[0] != 0xFF or \
            (header[1] & 0xE0) != 0xE0:
        return None
    version_bits = (header[1] >> 3) & 3
    layer_bits = (header[1] >> 1) & 3
    rate_idx = (header[2] >> 2) & 3
    channel_mode = (header[3] >> 6) & 3
    if version_bits == 1 or layer_bits == 0:
        return None
    rates = {0: (11025, 12000, 8000),
             2: (22050, 24000, 16000),
             3: (44100, 48000, 32000)}[version_bits]
    if rate_idx == 3:
        return None
    return (rates[rate_idx],
            1 if channel_mode == 3 else 2,
            4 - layer_bits)


def _to_16bit_stereo(pcmreader):
    """converts a PCMReader to <=2ch / 16-bit for the lossy encoders
    (reference mp3.py:240-245 PCMConverter chain)"""
    from ..pcmconverter import Averager, BPSConverter

    out = pcmreader
    if out.channels > 2:
        out = Averager(out)
    if out.bits_per_sample != 16:
        out = BPSConverter(out, 16)
    return out
