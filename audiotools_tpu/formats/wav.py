"""RIFF WAVE container support.

Rebuild of the reference WAV layer (``/root/reference/audiotools/wav.py``):
WaveAudio with chunk walking, fmt parsing including WAVEFORMATEXTENSIBLE
(wav.py:288), from_pcm with streaming header rewrite (wav.py:660,720-726),
and wave_header_footer for foreign-chunk passthrough (wav.py:920).
"""

from __future__ import annotations

import struct

from .. import (EncodingError, InvalidFile, UnsupportedBitsPerSample)
from ..audiofile import WaveContainer
from ..pcmstream import (ChannelMask, PCMReader, PCMReaderError,
                         FRAMELIST_SIZE, transfer_framelist_data,
                         CounterPCMReader)

WAVE_FORMAT_PCM = 0x0001
WAVE_FORMAT_EXTENSIBLE = 0xFFFE
EXTENSIBLE_GUID = (b"\x00\x00\x00\x00\x10\x00\x80\x00"
                   b"\x00\xaa\x00\x38\x9b\x71")


class InvalidWave(InvalidFile):
    """raised by invalid files during WAVE initialization"""


def parse_fmt(chunk_data):
    """parses a fmt chunk body

    returns (channels, sample_rate, bits_per_sample, channel_mask)
    and may raise ValueError if the fmt chunk is invalid"""
    if len(chunk_data) < 16:
        raise ValueError("fmt chunk is too short")
    (compression, channels, sample_rate,
     _bytes_per_second, _block_align,
     bits_per_sample) = struct.unpack("<HHIIHH", chunk_data[:16])

    if compression == WAVE_FORMAT_PCM:
        if channels in (1, 2):
            channel_mask = ChannelMask.from_channels(channels)
        else:
            channel_mask = ChannelMask(0)
        return (channels, sample_rate, bits_per_sample, channel_mask)
    elif compression == WAVE_FORMAT_EXTENSIBLE:
        if len(chunk_data) < 40:
            raise ValueError("fmt chunk is too short for WAVEFORMATEXTENSIBLE")
        (cb_size, _valid_bits, mask) = struct.unpack(
            "<HHI", chunk_data[16:24])
        sub_format = chunk_data[24:40]
        if sub_format[0:2] != b"\x01\x00" or sub_format[2:] != EXTENSIBLE_GUID:
            raise ValueError("unsupported WAVE compression")
        return (channels, sample_rate, bits_per_sample, ChannelMask(mask))
    else:
        raise ValueError("unsupported WAVE compression")


def build_fmt(channels, sample_rate, bits_per_sample, channel_mask):
    """returns a fmt chunk body from the given stream attributes

    uses plain PCM for 1-2 channel streams and WAVEFORMATEXTENSIBLE
    for anything else"""
    block_align = channels * (bits_per_sample // 8)
    bytes_per_second = sample_rate * block_align
    if (channels <= 2) and (bits_per_sample <= 16):
        return struct.pack("<HHIIHH",
                           WAVE_FORMAT_PCM, channels, sample_rate,
                           bytes_per_second, block_align, bits_per_sample)
    else:
        return (struct.pack("<HHIIHHHHI",
                            WAVE_FORMAT_EXTENSIBLE, channels, sample_rate,
                            bytes_per_second, block_align, bits_per_sample,
                            22, bits_per_sample, int(channel_mask)) +
                b"\x01\x00" + EXTENSIBLE_GUID)


class RIFF_Chunk:
    """one RIFF WAVE chunk: id + raw data
    (role of reference wav.py:30 RIFF_Chunk / :86 RIFF_File_Chunk —
    data is materialized eagerly, which the chunk sizes here permit)"""

    def __init__(self, chunk_id, chunk_data):
        self.id = chunk_id
        self.__data__ = chunk_data

    def __repr__(self):
        return "RIFF_Chunk(%r)" % (self.id,)

    def size(self):
        """the chunk's data size in bytes, not counting the pad"""
        return len(self.__data__)

    def total_size(self):
        """the chunk's total size including header and padding"""
        size = len(self.__data__)
        return 8 + size + (size % 2)

    def data(self):
        return self.__data__

    def verify(self):
        return True

    def write(self, f):
        """writes the full chunk (header, data, pad) to a stream;
        returns the bytes written"""
        f.write(struct.pack("<4sI", self.id, len(self.__data__)))
        f.write(self.__data__)
        if len(self.__data__) % 2:
            f.write(b"\x00")
        return self.total_size()


class WaveReader(PCMReader):
    """a PCMReader for reading the data chunk of a wave file"""

    def __init__(self, wave_file, sample_rate, channels, channel_mask,
                 bits_per_sample, data_length):
        from ..pcmstream import LimitedFileReader
        PCMReader.__init__(self,
                           LimitedFileReader(wave_file, data_length),
                           sample_rate, channels, channel_mask,
                           bits_per_sample,
                           signed=(bits_per_sample != 8),
                           big_endian=False)


class WaveAudio(WaveContainer):
    """a waveform audio file (RIFF WAVE)"""

    SUFFIX = "wav"
    NAME = SUFFIX
    DESCRIPTION = "Waveform Audio File Format"
    COMPRESSION_MODES = ("",)
    DEFAULT_COMPRESSION = ""

    def __init__(self, filename):
        WaveContainer.__init__(self, filename)
        self.__channels__ = 0
        self.__sample_rate__ = 0
        self.__bits_per_sample__ = 0
        self.__channel_mask__ = ChannelMask(0)
        self.__data_size__ = 0
        self.__chunk_ids__ = []

        try:
            with open(filename, "rb") as f:
                for (chunk_id, chunk_size, offset) in self.__chunks__(f):
                    self.__chunk_ids__.append(chunk_id)
                    if chunk_id == b"fmt ":
                        f.seek(offset, 0)
                        try:
                            (self.__channels__,
                             self.__sample_rate__,
                             self.__bits_per_sample__,
                             self.__channel_mask__) = parse_fmt(
                                 f.read(chunk_size))
                        except ValueError as err:
                            raise InvalidWave(str(err))
                    elif chunk_id == b"data":
                        self.__data_size__ = chunk_size
        except IOError as err:
            raise InvalidWave(str(err))

        if b"fmt " not in self.__chunk_ids__:
            raise InvalidWave("fmt chunk not found")
        if b"data" not in self.__chunk_ids__:
            raise InvalidWave("data chunk not found")

    def __chunks__(self, wave_file):
        """yields (chunk_id, chunk_size, chunk_data_offset) tuples"""
        header = wave_file.read(12)
        if (len(header) < 12 or header[0:4] != b"RIFF" or
                header[8:12] != b"WAVE"):
            raise InvalidWave("not a RIFF WAVE file")
        total_size = struct.unpack("<I", header[4:8])[0] - 4

        while total_size > 0:
            chunk_header = wave_file.read(8)
            if len(chunk_header) < 8:
                break
            (chunk_id, chunk_size) = struct.unpack("<4sI", chunk_header)
            total_size -= 8
            offset = wave_file.tell()
            yield (chunk_id, chunk_size, offset)
            # chunks are padded to even sizes
            padded = chunk_size + (chunk_size % 2)
            wave_file.seek(offset + padded, 0)
            total_size -= padded

    def lossless(self):
        return True

    def bits_per_sample(self):
        return self.__bits_per_sample__

    def channels(self):
        return self.__channels__

    def channel_mask(self):
        return self.__channel_mask__

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
        """returns a PCMReader of this file's PCM data"""
        try:
            f = open(self.filename, "rb")
            for (chunk_id, chunk_size, offset) in self.__chunks__(f):
                if chunk_id == b"data":
                    f.seek(offset, 0)
                    return WaveReader(f,
                                      self.__sample_rate__,
                                      self.__channels__,
                                      int(self.__channel_mask__),
                                      self.__bits_per_sample__,
                                      chunk_size)
            f.close()
            return PCMReaderError("data chunk not found",
                                  self.__sample_rate__,
                                  self.__channels__,
                                  int(self.__channel_mask__),
                                  self.__bits_per_sample__)
        except IOError as err:
            return PCMReaderError(str(err),
                                  self.__sample_rate__,
                                  self.__channels__,
                                  int(self.__channel_mask__),
                                  self.__bits_per_sample__)

    @classmethod
    def from_pcm(cls, filename, pcmreader,
                 compression=None, total_pcm_frames=None):
        """encodes a new file from PCM data"""
        if pcmreader.bits_per_sample not in (8, 16, 24):
            raise UnsupportedBitsPerSample(
                filename, pcmreader.bits_per_sample)

        try:
            f = open(filename, "wb")
        except IOError as err:
            raise EncodingError(str(err))

        try:
            counter = CounterPCMReader(pcmreader)
            fmt = build_fmt(pcmreader.channels,
                            pcmreader.sample_rate,
                            pcmreader.bits_per_sample,
                            pcmreader.channel_mask)
            # placeholder sizes, rewritten after the data is known
            f.write(b"RIFF" + b"\x00" * 4 + b"WAVE")
            f.write(b"fmt " + struct.pack("<I", len(fmt)) + fmt)
            f.write(b"data" + b"\x00" * 4)
            data_offset = f.tell()

            signed = (pcmreader.bits_per_sample != 8)
            transfer_framelist_data(counter, f.write,
                                    signed=signed, big_endian=False)

            data_size = f.tell() - data_offset
            if data_size % 2:
                f.write(b"\x00")
            total_size = f.tell() - 8
            f.seek(4, 0)
            f.write(struct.pack("<I", total_size))
            f.seek(data_offset - 4, 0)
            f.write(struct.pack("<I", data_size))
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

    def chunks(self):
        """yields RIFF_Chunk objects for every chunk in the file
        (reference wav.py:839)"""
        with open(self.filename, "rb") as f:
            for (chunk_id, chunk_size, offset) in self.__chunks__(f):
                f.seek(offset, 0)
                yield RIFF_Chunk(chunk_id, f.read(chunk_size))

    @classmethod
    def wave_from_chunks(cls, filename, chunk_iter):
        """builds a new RIFF WAVE file from an iterator of
        RIFF_Chunk-compatible objects (reference wav.py:896)"""
        try:
            f = open(filename, "wb")
        except IOError as err:
            raise EncodingError(str(err))
        try:
            f.write(struct.pack("<4sI4s", b"RIFF", 4, b"WAVE"))
            total = 4
            for chunk in chunk_iter:
                total += chunk.write(f)
            f.seek(4, 0)
            f.write(struct.pack("<I", total))
        finally:
            f.close()
        return cls(filename)

    def has_foreign_wave_chunks(self):
        """returns True if the file has chunks other than fmt/data"""
        return set(self.__chunk_ids__) != {b"fmt ", b"data"}

    def wave_header_footer(self):
        """returns a (header, footer) bytes pair around the data chunk"""
        with open(self.filename, "rb") as f:
            data_offset = None
            data_size = None
            for (chunk_id, chunk_size, offset) in self.__chunks__(f):
                if chunk_id == b"data":
                    data_offset = offset
                    data_size = chunk_size
                    break
            if data_offset is None:
                raise ValueError("no data chunk found")
            f.seek(0, 0)
            header = f.read(data_offset)
            f.seek(data_offset + data_size, 0)
            footer = f.read()
            return (header, footer)

    @classmethod
    def from_wave(cls, filename, header, pcmreader, footer,
                  compression=None):
        """builds a WAVE file from header + PCM data + footer"""
        try:
            f = open(filename, "wb")
        except IOError as err:
            raise EncodingError(str(err))
        try:
            f.write(header)
            signed = (pcmreader.bits_per_sample != 8)
            transfer_framelist_data(pcmreader, f.write,
                                    signed=signed, big_endian=False)
            f.write(footer)
            f.close()
            return cls(filename)
        except (IOError, ValueError) as err:
            cls.__unlink__(filename)
            raise EncodingError(str(err))
        finally:
            try:
                pcmreader.close()
            except Exception:
                pass

    def verify(self, progress=None):
        """verifies chunk structure and data chunk contents"""
        # walk all chunks, ensuring sizes are consistent
        with open(self.filename, "rb") as f:
            try:
                for (chunk_id, chunk_size, offset) in self.__chunks__(f):
                    f.seek(offset, 0)
                    if len(f.read(chunk_size)) != chunk_size:
                        raise InvalidWave("truncated %s chunk" %
                                          (chunk_id.decode('ascii',
                                                           'replace'),))
            except IOError as err:
                raise InvalidWave(str(err))
        return True
