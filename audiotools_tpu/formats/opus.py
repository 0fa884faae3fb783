"""Ogg Opus format support.

Rebuild of the reference ``/root/reference/audiotools/opus.py`` (559
LoC): Ogg Opus files with OpusTags (VorbisComment) metadata, decode/
encode via libopus with this framework's own Ogg layer
(``codecs/opus.py``).  Opus always decodes at 48 kHz; encoding
resamples non-48 kHz input through the polyphase Resampler.
"""

from __future__ import annotations

from .. import text

import struct

from ..audiofile import AudioFile, MetaData
from ..pcmstream import ChannelMask, PCMReaderError
from ..meta.vorbiscomment import VorbisComment
from .vorbis import (_parse_comment_packet, _build_comment_packet)


class InvalidOpus(Exception):
    pass


class OpusAudio(AudioFile):
    """an Ogg Opus audio file (reference opus.py:30)"""

    SUFFIX = "opus"
    NAME = "opus"
    DESCRIPTION = "Opus Audio Codec"
    DEFAULT_COMPRESSION = "10"
    COMPRESSION_MODES = tuple(map(str, range(0, 11)))
    COMPRESSION_DESCRIPTIONS = {"0": text.COMP_OPUS_0,
                                "10": text.COMP_OPUS_10}

    def __init__(self, filename):
        from ..ogg import PageReader, PacketReader
        from ..codecs.opus import parse_opus_head
        AudioFile.__init__(self, filename)
        try:
            with open(filename, "rb") as f:
                packets = PacketReader(PageReader(f))
                head = packets.read_packet()
                (channels, preskip, _input_rate,
                 _mapping) = parse_opus_head(head)
                self.__channels__ = channels
                self.__preskip__ = preskip
        except (IOError, ValueError) as err:
            raise InvalidOpus(str(err))
        self.__total_frames__ = None

    @classmethod
    def available(cls, system_binaries=None):
        from ..codecs.opus import opus_lib
        return opus_lib() is not None

    def lossless(self):
        return False

    def bits_per_sample(self):
        return 16

    def channels(self):
        return self.__channels__

    def channel_mask(self):
        return ChannelMask(0x3 if self.__channels__ == 2 else 0x4)

    def sample_rate(self):
        return 48000

    def total_frames(self):
        if self.__total_frames__ is None:
            from .vorbis import VorbisAudio
            granule = VorbisAudio.__last_granule__(self)
            self.__total_frames__ = max(granule - self.__preskip__, 0)
        return self.__total_frames__

    def seekable(self):
        return False

    # ---- metadata -------------------------------------------------------

    def get_metadata(self):
        from ..ogg import PageReader, PacketReader
        with open(self.filename, "rb") as f:
            packets = PacketReader(PageReader(f))
            packets.read_packet()               # OpusHead
            tags = packets.read_packet()
            if tags[0:8] != b"OpusTags":
                return None
            return _parse_comment_packet(tags, b"OpusTags")

    def update_metadata(self, metadata):
        from ..ogg import (PageReader, PacketReader, PageWriter,
                           packet_to_pages, Page)
        from ..utils.files import TemporaryFile

        if not isinstance(metadata, VorbisComment):
            raise ValueError("metadata must be VorbisComment")

        with open(self.filename, "rb") as f:
            packets = PacketReader(PageReader(f))
            head = packets.read_packet()
            packets.read_packet()               # old OpusTags
            last_header_page = packets.page.sequence_number
            serial = packets.page.bitstream_serial_number
        with open(self.filename, "rb") as f:
            reader = PageReader(f)
            pages = []
            while True:
                try:
                    pages.append(reader.read())
                except (IOError, ValueError):
                    break
        seqs = [p.sequence_number for p in pages]
        first_audio_index = seqs.index(last_header_page) + 1

        tags_packet = _build_comment_packet(metadata, b"OpusTags",
                                            framing=False)
        new_file = TemporaryFile(self.filename)
        writer = PageWriter(new_file)
        head_page = Page(False, True, False, 0, serial, 0, [head])
        writer.write(head_page)
        seq = 1
        for page in packet_to_pages(tags_packet, serial, seq):
            writer.write(page)
            seq += 1
        for page in pages[first_audio_index:]:
            page.sequence_number = seq
            seq += 1
            writer.write(page)
        new_file.close()

    def set_metadata(self, metadata):
        metadata = VorbisComment.converted(metadata)
        if metadata is None:
            return
        old = self.get_metadata()
        if old is not None:
            metadata.vendor_string = old.vendor_string
        self.update_metadata(metadata)

    def delete_metadata(self):
        self.set_metadata(MetaData())

    # ---- audio ----------------------------------------------------------

    def to_pcm(self):
        from ..codecs.opus import OpusDecoder
        try:
            return OpusDecoder(self.filename)
        except (IOError, ValueError) as err:
            return PCMReaderError(str(err), 48000, self.channels(),
                                  int(self.channel_mask()), 16)

    @classmethod
    def from_pcm(cls, filename, pcmreader, compression=None,
                 total_pcm_frames=None):
        from .. import EncodingError
        from ..codecs.opus import encode_opus
        from ..pcmconverter import Averager, Resampler, BPSConverter
        from ..utils.config import default_quality

        if (compression is None or
                compression not in cls.COMPRESSION_MODES):
            compression = default_quality(cls.NAME) or \
                cls.DEFAULT_COMPRESSION

        reader = pcmreader
        if reader.channels > 2:
            reader = Averager(reader)
        if reader.bits_per_sample != 16:
            reader = BPSConverter(reader, 16)
        if reader.sample_rate != 48000:
            reader = Resampler(reader, 48000)
        try:
            encode_opus(filename, reader,
                        compression=int(compression))
        except (ValueError, IOError) as err:
            raise EncodingError(str(err))
        return cls(filename)

    def verify(self, progress=None):
        from .. import InvalidFile
        decoder = self.to_pcm()
        if isinstance(decoder, PCMReaderError):
            raise InvalidFile(decoder.error_message)
        try:
            framelist = decoder.read(65536)
            while framelist.frames > 0:
                framelist = decoder.read(65536)
        except (IOError, ValueError) as err:
            raise InvalidFile(str(err))
        finally:
            decoder.close()
        return True
