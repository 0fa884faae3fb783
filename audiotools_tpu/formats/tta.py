"""True Audio (TTA) format support.

Rebuild of the reference TTA layer (``/root/reference/audiotools/tta.py``):
TrueAudio with the TTA1 header + CRC, frame-length seektable, ID3 tag
skipping, and from_pcm with seektable back-patching.
"""

from __future__ import annotations

from .. import text

import struct

from .. import EncodingError, InvalidFile
from ..audiofile import AudioFile
from ..pcmstream import (ChannelMask, BufferedPCMReader,
                         CounterPCMReader, PCMReaderError, transfer_data)
from ..ref.tta import crc32, div_ceil


class InvalidTTA(InvalidFile):
    pass


def build_header(channels, bits_per_sample, sample_rate,
                 total_pcm_frames):
    """returns the 22-byte TTA1 header including CRC"""
    data = (b"TTA1" +
            struct.pack("<HHHII", 1, channels, bits_per_sample,
                        sample_rate, total_pcm_frames))
    return data + crc32(data).to_bytes(4, "little")


def build_seektable(frame_sizes):
    """returns the seektable bytes (32-bit LE lengths + CRC)"""
    data = b"".join(struct.pack("<I", size) for size in frame_sizes)
    return data + crc32(data).to_bytes(4, "little")


class TrueAudio(AudioFile):
    """a True Audio file"""

    SUFFIX = "tta"
    NAME = SUFFIX
    DESCRIPTION = "True Audio"
    COMPRESSION_MODES = ("",)
    COMPRESSION_DESCRIPTIONS = {"": text.COMP_TTA}
    DEFAULT_COMPRESSION = ""

    def __init__(self, filename):
        AudioFile.__init__(self, filename)
        from ..meta.id3 import skip_id3v2_comment

        try:
            with open(filename, "rb") as f:
                self.__stream_offset__ = skip_id3v2_comment(f)
                header = f.read(22)
                if len(header) < 22 or header[0:4] != b"TTA1":
                    raise InvalidTTA(text.ERR_TTA_INVALID_SIGNATURE)
                (format_, self.__channels__,
                 self.__bits_per_sample__,
                 self.__sample_rate__,
                 self.__total_pcm_frames__) = struct.unpack(
                     "<HHHII", header[4:18])
                if format_ != 1:
                    raise InvalidTTA("invalid TTA format")
                total_tta_frames = div_ceil(
                    self.__total_pcm_frames__ * 245,
                    self.__sample_rate__ * 256)
                seektable = f.read(total_tta_frames * 4 + 4)
                self.__frame_lengths__ = [
                    struct.unpack("<I", seektable[i * 4:i * 4 + 4])[0]
                    for i in range(total_tta_frames)]
        except IOError as err:
            raise InvalidTTA(str(err))

    def lossless(self):
        return True

    def bits_per_sample(self):
        return self.__bits_per_sample__

    def channels(self):
        return self.__channels__

    def channel_mask(self):
        if self.__channels__ == 1:
            return ChannelMask(0x4)
        elif self.__channels__ == 2:
            return ChannelMask(0x3)
        else:
            return ChannelMask(0)

    def sample_rate(self):
        return self.__sample_rate__

    def total_frames(self):
        return self.__total_pcm_frames__

    def seekable(self):
        return True

    def data_size(self):
        """returns the size of the file's data from header+seektable"""
        return (22 + (len(self.__frame_lengths__) * 4) + 4 +
                sum(self.__frame_lengths__))

    def to_pcm(self):
        from ..codecs.tta import decoder_for_file
        try:
            f = open(self.filename, "rb")
            if self.__stream_offset__ > 0:
                f.seek(self.__stream_offset__)
            return decoder_for_file(f)
        except (IOError, ValueError) as err:
            return PCMReaderError(str(err),
                                  self.sample_rate(),
                                  self.channels(),
                                  int(self.channel_mask()),
                                  self.bits_per_sample())

    @classmethod
    def from_pcm(cls, filename, pcmreader,
                 compression=None,
                 total_pcm_frames=None,
                 encoding_function=None):
        """encodes a new file from PCM data"""
        from ..codecs.tta import encode_tta

        if encoding_function is None:
            encoding_function = encode_tta

        try:
            file = open(filename, "wb")
        except IOError as err:
            raise EncodingError(str(err))

        counter = CounterPCMReader(pcmreader)
        try:
            if total_pcm_frames is not None:
                total_tta_frames = div_ceil(
                    total_pcm_frames * 245, pcmreader.sample_rate * 256)
                file.write(build_header(pcmreader.channels,
                                        pcmreader.bits_per_sample,
                                        pcmreader.sample_rate,
                                        total_pcm_frames))
                seektable_offset = file.tell()
                file.write(build_seektable([0] * total_tta_frames))
                frame_sizes = encoding_function(
                    file, BufferedPCMReader(counter))
                if counter.frames_written != total_pcm_frames:
                    file.close()
                    cls.__unlink__(filename)
                    raise EncodingError("total PCM frames mismatch")
                file.seek(seektable_offset, 0)
                file.write(build_seektable(frame_sizes))
            else:
                import tempfile
                frames = tempfile.TemporaryFile()
                frame_sizes = encoding_function(
                    frames, BufferedPCMReader(counter))
                file.write(build_header(pcmreader.channels,
                                        pcmreader.bits_per_sample,
                                        pcmreader.sample_rate,
                                        counter.frames_written))
                file.write(build_seektable(frame_sizes))
                frames.seek(0, 0)
                transfer_data(frames.read, file.write)
                frames.close()
            file.close()
            return cls(filename)
        except (IOError, ValueError) as err:
            file.close()
            cls.__unlink__(filename)
            raise EncodingError(str(err))
        finally:
            try:
                pcmreader.close()
            except Exception:
                pass

    @classmethod
    def supports_replay_gain(cls):
        return True

    @classmethod
    def lossless_replay_gain(cls):
        return True

    @classmethod
    def can_add_replay_gain(cls, audiofiles):
        return all(isinstance(f, TrueAudio) for f in audiofiles)

    def get_metadata(self):
        """returns ApeTag metadata, or None"""
        try:
            from ..meta.ape import ApeTag
        except ImportError:
            return None
        with open(self.filename, "rb") as f:
            return ApeTag.read(f)

    def set_metadata(self, metadata):
        try:
            from ..meta.ape import ApeTaggedAudio
        except ImportError:
            return
        ApeTaggedAudio.set_metadata(self, metadata)

    def update_metadata(self, metadata):
        try:
            from ..meta.ape import ApeTaggedAudio
        except ImportError:
            return
        ApeTaggedAudio.update_metadata(self, metadata)

    def delete_metadata(self):
        try:
            from ..meta.ape import ApeTaggedAudio
        except ImportError:
            return
        ApeTaggedAudio.delete_metadata(self)
