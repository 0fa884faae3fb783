"""Sun AU container support.

Rebuild of the reference AU layer (``/root/reference/audiotools/au.py``):
big-endian signed linear PCM behind a ``.snd`` header.
"""

from __future__ import annotations

from .. import text

import struct

from .. import EncodingError, InvalidFile, UnsupportedBitsPerSample
from ..audiofile import AudioFile
from ..pcmstream import (ChannelMask, PCMReader, PCMReaderError,
                         CounterPCMReader, transfer_framelist_data,
                         LimitedFileReader)


class InvalidAU(InvalidFile):
    pass


class AuAudio(AudioFile):
    """a Sun AU audio file"""

    SUFFIX = "au"
    NAME = SUFFIX
    DESCRIPTION = "Sun Au"
    COMPRESSION_MODES = ("",)
    DEFAULT_COMPRESSION = ""

    # encoding values for linear PCM
    ENCODINGS = {2: 8, 3: 16, 4: 24}

    def __init__(self, filename):
        AudioFile.__init__(self, filename)
        try:
            with open(filename, "rb") as f:
                header = f.read(24)
                if len(header) < 24 or header[0:4] != b".snd":
                    raise InvalidAU("invalid Au header")
                (self.__data_offset__,
                 self.__data_size__,
                 encoding,
                 self.__sample_rate__,
                 self.__channels__) = struct.unpack(">IIIII", header[4:24])
                if encoding not in self.ENCODINGS:
                    raise InvalidAU("unsupported Au encoding")
                self.__bits_per_sample__ = self.ENCODINGS[encoding]
        except IOError as err:
            raise InvalidAU(str(err))

    def lossless(self):
        return True

    def bits_per_sample(self):
        return self.__bits_per_sample__

    def channels(self):
        return self.__channels__

    def channel_mask(self):
        if self.__channels__ in (1, 2):
            return ChannelMask.from_channels(self.__channels__)
        else:
            return ChannelMask(0)

    def sample_rate(self):
        return self.__sample_rate__

    def total_frames(self):
        bytes_per_frame = self.__channels__ * \
            (self.__bits_per_sample__ // 8)
        if bytes_per_frame:
            return self.__data_size__ // bytes_per_frame
        else:
            return 0

    def seekable(self):
        return True

    def to_pcm(self):
        try:
            f = open(self.filename, "rb")
            f.seek(self.__data_offset__, 0)
            return PCMReader(LimitedFileReader(f, self.__data_size__),
                             self.__sample_rate__,
                             self.__channels__,
                             int(self.channel_mask()),
                             self.__bits_per_sample__,
                             signed=True,
                             big_endian=True)
        except IOError as err:
            return PCMReaderError(str(err),
                                  self.__sample_rate__,
                                  self.__channels__,
                                  int(self.channel_mask()),
                                  self.__bits_per_sample__)

    @classmethod
    def from_pcm(cls, filename, pcmreader,
                 compression=None, total_pcm_frames=None):
        if pcmreader.bits_per_sample not in (8, 16, 24):
            raise UnsupportedBitsPerSample(
                filename, pcmreader.bits_per_sample)

        encoding = {8: 2, 16: 3, 24: 4}[pcmreader.bits_per_sample]

        try:
            f = open(filename, "wb")
        except IOError as err:
            raise EncodingError(str(err))

        try:
            counter = CounterPCMReader(pcmreader)
            f.write(b".snd")
            f.write(struct.pack(">IIIII", 24, 0, encoding,
                                pcmreader.sample_rate,
                                pcmreader.channels))
            transfer_framelist_data(counter, f.write,
                                    signed=True, big_endian=True)
            data_size = f.tell() - 24
            f.seek(8, 0)
            f.write(struct.pack(">I", data_size))
            f.close()

            if ((total_pcm_frames is not None) and
                    (counter.frames_written != total_pcm_frames)):
                cls.__unlink__(filename)
                raise EncodingError("total PCM frames mismatch")
            return cls(filename)
        except (IOError, ValueError) as err:
            cls.__unlink__(filename)
            raise EncodingError(str(err))
        finally:
            try:
                pcmreader.close()
            except Exception:
                pass

    def pcm_split(self):
        """returns the (header, footer) bytes pair around the PCM
        data (reference au.py:180; Sun AU has no footer)"""
        import struct as struct_mod
        with open(self.filename, "rb") as f:
            (magic, data_offset) = struct_mod.unpack(">4sI",
                                                     f.read(8))
            if magic != b".snd":
                raise ValueError(text.ERR_AU_INVALID_HEADER
                                 if hasattr(text, "ERR_AU_INVALID_HEADER")
                                 else "invalid Sun AU header")
            f.seek(0, 0)
            header = f.read(data_offset)
        return (header, b"")

    @classmethod
    def track_name(cls, file_path, track_metadata=None, format=None,
                   suffix=None):
        return AudioFile.track_name(file_path, track_metadata, format,
                                    suffix=cls.SUFFIX)
