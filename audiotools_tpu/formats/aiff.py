"""AIFF container support.

Rebuild of the reference AIFF layer (``/root/reference/audiotools/aiff.py``):
AiffAudio with COMM parsing (80-bit IEEE-extended sample rates), SSND
offset/block handling, foreign-chunk passthrough, and streaming from_pcm.
"""

from __future__ import annotations

import struct

from .. import EncodingError, InvalidFile, UnsupportedBitsPerSample
from ..audiofile import AiffContainer
from ..pcmstream import (ChannelMask, PCMReader, PCMReaderError,
                         CounterPCMReader, transfer_framelist_data)


class InvalidAIFF(InvalidFile):
    """raised if some problem occurs parsing AIFF chunks"""


def parse_ieee_extended(data):
    """converts an 80-bit IEEE-extended float (bytes) to an int"""
    (sign_exponent, mantissa) = struct.unpack(">HQ", data[:10])
    exponent = sign_exponent & 0x7FFF
    sign = -1 if (sign_exponent & 0x8000) else 1
    if exponent == mantissa == 0:
        return 0
    elif exponent == 0x7FFF:
        return float("nan")
    else:
        return int(sign * mantissa * (2.0 ** (exponent - 16383 - 63)))


def build_ieee_extended(value):
    """converts an int to an 80-bit IEEE-extended float (bytes)"""
    if value < 0:
        sign = 0x8000
        value = -value
    else:
        sign = 0
    if value == 0:
        return b"\x00" * 10
    exponent = 16383 + 63
    mantissa = value
    while mantissa < (1 << 63):
        mantissa <<= 1
        exponent -= 1
    while mantissa >= (1 << 64):
        mantissa >>= 1
        exponent += 1
    return struct.pack(">HQ", sign | exponent, mantissa)


def parse_comm(reader_or_bytes):
    """parses a COMM chunk body

    returns (channels, total_sample_frames, bits_per_sample,
    sample_rate, channel_mask); accepts bytes or a BitstreamReader"""
    if hasattr(reader_or_bytes, "read_bytes"):
        data = reader_or_bytes.read_bytes(18)
    else:
        data = bytes(reader_or_bytes)
    (channels, total_sample_frames,
     bits_per_sample) = struct.unpack(">HIH", data[:8])
    sample_rate = parse_ieee_extended(data[8:18])
    if channels == 1:
        channel_mask = ChannelMask(0x4)
    elif channels == 2:
        channel_mask = ChannelMask(0x3)
    else:
        channel_mask = ChannelMask(0)
    return (channels, total_sample_frames, bits_per_sample,
            sample_rate, channel_mask)


class AIFF_Chunk:
    """one AIFF chunk: id + raw data (role of reference aiff.py's
    AIFF_Chunk / AIFF_File_Chunk; big-endian sizes)"""

    def __init__(self, chunk_id, chunk_data):
        self.id = chunk_id
        self.__data__ = chunk_data

    def __repr__(self):
        return "AIFF_Chunk(%r)" % (self.id,)

    def size(self):
        return len(self.__data__)

    def total_size(self):
        size = len(self.__data__)
        return 8 + size + (size % 2)

    def data(self):
        return self.__data__

    def verify(self):
        return True

    def write(self, f):
        f.write(struct.pack(">4sI", self.id, len(self.__data__)))
        f.write(self.__data__)
        if len(self.__data__) % 2:
            f.write(b"\x00")
        return self.total_size()


class AiffAudio(AiffContainer):
    """an Audio Interchange File Format file"""

    SUFFIX = "aiff"
    NAME = SUFFIX
    DESCRIPTION = "Audio Interchange File Format"
    COMPRESSION_MODES = ("",)
    DEFAULT_COMPRESSION = ""

    def __init__(self, filename):
        AiffContainer.__init__(self, filename)
        self.__channels__ = 0
        self.__sample_rate__ = 0
        self.__bits_per_sample__ = 0
        self.__total_sample_frames__ = 0
        self.__channel_mask__ = ChannelMask(0)
        self.__chunk_ids__ = []

        try:
            with open(filename, "rb") as f:
                for (chunk_id, chunk_size, offset) in self.__chunks__(f):
                    self.__chunk_ids__.append(chunk_id)
                    if chunk_id == b"COMM":
                        f.seek(offset, 0)
                        (self.__channels__,
                         self.__total_sample_frames__,
                         self.__bits_per_sample__,
                         self.__sample_rate__,
                         self.__channel_mask__) = parse_comm(
                             f.read(chunk_size))
        except IOError as err:
            raise InvalidAIFF(str(err))

        if b"COMM" not in self.__chunk_ids__:
            raise InvalidAIFF("COMM chunk not found")
        if b"SSND" not in self.__chunk_ids__:
            raise InvalidAIFF("SSND chunk not found")

    def __chunks__(self, aiff_file):
        """yields (chunk_id, chunk_size, chunk_offset) tuples"""
        header = aiff_file.read(12)
        if (len(header) < 12 or header[0:4] != b"FORM" or
                header[8:12] != b"AIFF"):
            raise InvalidAIFF("not an AIFF file")
        total_size = struct.unpack(">I", header[4:8])[0] - 4

        while total_size > 0:
            chunk_header = aiff_file.read(8)
            if len(chunk_header) < 8:
                break
            (chunk_id, chunk_size) = struct.unpack(">4sI", chunk_header)
            total_size -= 8
            offset = aiff_file.tell()
            yield (chunk_id, chunk_size, offset)
            padded = chunk_size + (chunk_size % 2)
            aiff_file.seek(offset + padded, 0)
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
        return self.__total_sample_frames__

    def seekable(self):
        return True

    def to_pcm(self):
        """returns a PCMReader of this file's PCM data (big-endian)"""
        from ..pcmstream import LimitedFileReader
        try:
            f = open(self.filename, "rb")
            for (chunk_id, chunk_size, offset) in self.__chunks__(f):
                if chunk_id == b"SSND":
                    f.seek(offset, 0)
                    # SSND chunk: 4-byte offset + 4-byte block size
                    (data_offset, _block_size) = struct.unpack(
                        ">II", f.read(8))
                    f.seek(data_offset, 1)
                    return PCMReader(
                        LimitedFileReader(f, chunk_size - 8 - data_offset),
                        self.__sample_rate__,
                        self.__channels__,
                        int(self.__channel_mask__),
                        self.__bits_per_sample__,
                        signed=True,
                        big_endian=True)
            f.close()
            return PCMReaderError("SSND chunk not found",
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
            # placeholder header, rewritten once sizes are known
            f.write(b"FORM" + b"\x00" * 4 + b"AIFF")
            f.write(b"COMM" + struct.pack(">I", 18))
            comm_offset = f.tell()
            f.write(b"\x00" * 18)
            f.write(b"SSND" + b"\x00" * 4)
            ssnd_offset = f.tell()
            f.write(struct.pack(">II", 0, 0))

            transfer_framelist_data(counter, f.write,
                                    signed=True, big_endian=True)

            data_size = f.tell() - ssnd_offset
            if (f.tell() % 2):
                f.write(b"\x00")
            total_size = f.tell() - 8
            f.seek(4, 0)
            f.write(struct.pack(">I", total_size))
            f.seek(comm_offset, 0)
            f.write(struct.pack(">HIH",
                                pcmreader.channels,
                                counter.frames_written,
                                pcmreader.bits_per_sample))
            f.write(build_ieee_extended(pcmreader.sample_rate))
            f.seek(ssnd_offset - 4, 0)
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

    def chunks(self):
        """yields AIFF_Chunk objects for every chunk in the file"""
        with open(self.filename, "rb") as f:
            for (chunk_id, chunk_size, offset) in self.__chunks__(f):
                f.seek(offset, 0)
                yield AIFF_Chunk(chunk_id, f.read(chunk_size))

    @classmethod
    def aiff_from_chunks(cls, filename, chunk_iter):
        """builds a new AIFF file from an iterator of
        AIFF_Chunk-compatible objects"""
        try:
            f = open(filename, "wb")
        except IOError as err:
            raise EncodingError(str(err))
        try:
            f.write(struct.pack(">4sI4s", b"FORM", 4, b"AIFF"))
            total = 4
            for chunk in chunk_iter:
                total += chunk.write(f)
            f.seek(4, 0)
            f.write(struct.pack(">I", total))
        finally:
            f.close()
        return cls(filename)

    def has_foreign_aiff_chunks(self):
        return set(self.__chunk_ids__) != {b"COMM", b"SSND"}

    def aiff_header_footer(self):
        """returns a (header, footer) bytes pair around the SSND data"""
        with open(self.filename, "rb") as f:
            for (chunk_id, chunk_size, offset) in self.__chunks__(f):
                if chunk_id == b"SSND":
                    f.seek(offset, 0)
                    (data_offset, _block) = struct.unpack(">II",
                                                          f.read(8))
                    data_start = offset + 8 + data_offset
                    data_size = chunk_size - 8 - data_offset
                    f.seek(0, 0)
                    header = f.read(data_start)
                    f.seek(data_start + data_size, 0)
                    footer = f.read()
                    return (header, footer)
            raise ValueError("no SSND chunk found")

    @classmethod
    def from_aiff(cls, filename, header, pcmreader, footer,
                  compression=None):
        """builds an AIFF file from header + PCM data + footer"""
        try:
            f = open(filename, "wb")
        except IOError as err:
            raise EncodingError(str(err))
        try:
            f.write(header)
            transfer_framelist_data(pcmreader, f.write,
                                    signed=True, big_endian=True)
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
        """verifies chunk structure"""
        with open(self.filename, "rb") as f:
            try:
                for (chunk_id, chunk_size, offset) in self.__chunks__(f):
                    f.seek(offset, 0)
                    if len(f.read(chunk_size)) != chunk_size:
                        raise InvalidAIFF("truncated %s chunk" %
                                          (chunk_id.decode('ascii',
                                                           'replace'),))
            except IOError as err:
                raise InvalidAIFF(str(err))
        return True
