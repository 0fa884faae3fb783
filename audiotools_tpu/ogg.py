"""Ogg container: pages, packets and (de)multiplexing.

Rebuild of the reference Ogg layer (``/root/reference/src/mod_ogg.c``
Page/PageReader/PageWriter and ``audiotools/ogg.py`` packet helpers)
as pure Python over byte I/O, with the page CRC-32 in the native
library (``atpu_ogg_crc``).  Pages follow RFC 3533: "OggS" capture
pattern, version 0, header-type flags, 64-bit granule position,
stream serial, page sequence, CRC over the whole page (CRC field
zeroed), and up to 255 lacing segments of up to 255 bytes.
"""

from __future__ import annotations

from . import text

import struct

from . import _native


def ogg_crc(data, initial=0):
    return _native.ogg_crc(data, initial)


class Page:
    """one Ogg page: header flags + raw segments"""

    def __init__(self, packet_continuation, stream_beginning,
                 stream_end, granule_position,
                 bitstream_serial_number, sequence_number, segments):
        self.packet_continuation = bool(packet_continuation)
        self.stream_beginning = bool(stream_beginning)
        self.stream_end = bool(stream_end)
        self.granule_position = granule_position
        self.bitstream_serial_number = bitstream_serial_number
        self.sequence_number = sequence_number
        self.segments = list(segments)

    def __repr__(self):
        return ("Page(seq=%d, granule=%d, segments=%d, size=%d)" %
                (self.sequence_number, self.granule_position,
                 len(self.segments), self.size()))

    def __len__(self):
        return len(self.segments)

    def __getitem__(self, i):
        return self.segments[i]

    def append(self, segment):
        if len(self.segments) >= 255:
            raise ValueError("page full")
        if len(segment) > 255:
            raise ValueError("segment too large")
        self.segments.append(bytes(segment))

    def full(self):
        """True if no further segments fit on this page"""
        return len(self.segments) >= 255

    def size(self):
        """the page's total size in bytes"""
        return (27 + len(self.segments) +
                sum(len(s) for s in self.segments))

    def header_type(self):
        return ((0x01 if self.packet_continuation else 0) |
                (0x02 if self.stream_beginning else 0) |
                (0x04 if self.stream_end else 0))

    def build(self):
        """returns the page as bytes (CRC filled in)"""
        body = b"".join(self.segments)
        lacing = bytes(len(s) for s in self.segments)
        header = struct.pack(
            "<4sBBqIII B",
            b"OggS", 0, self.header_type(),
            self.granule_position & 0xFFFFFFFFFFFFFFFF
            if self.granule_position >= 0 else self.granule_position,
            self.bitstream_serial_number & 0xFFFFFFFF,
            self.sequence_number & 0xFFFFFFFF,
            0,                           # CRC placeholder
            len(self.segments))
        crc = ogg_crc(header + lacing + body)
        return (header[:22] + struct.pack("<I", crc) + header[26:] +
                lacing + body)

    @classmethod
    def parse(cls, data, verify_crc=True):
        """parses one page from bytes; returns (Page, consumed)"""
        if len(data) < 27:
            raise IOError("truncated Ogg page")
        (magic, version, header_type, granule, serial, sequence,
         crc, n_segments) = struct.unpack("<4sBBqIIIB", data[:27])
        if magic != b"OggS":
            raise ValueError(text.ERR_OGG_INVALID_PAGE)
        if version != 0:
            raise ValueError("unsupported Ogg page version")
        if len(data) < 27 + n_segments:
            raise IOError("truncated Ogg page")
        lacing = data[27:27 + n_segments]
        total = 27 + n_segments + sum(lacing)
        if len(data) < total:
            raise IOError("truncated Ogg page")
        if verify_crc:
            check = (data[:22] + b"\x00\x00\x00\x00" +
                     data[26:total])
            if ogg_crc(check) != crc:
                raise ValueError(text.ERR_OGG_CHECKSUM_MISMATCH)
        segments = []
        pos = 27 + n_segments
        for length in lacing:
            segments.append(data[pos:pos + length])
            pos += length
        return (cls(header_type & 0x01, header_type & 0x02,
                    header_type & 0x04, granule, serial, sequence,
                    segments), total)


class PageReader:
    """reads Pages from a file object"""

    def __init__(self, file, verify_crc=True):
        self.file = file
        self.verify_crc = verify_crc

    def read(self):
        """returns the next Page; raises IOError at EOF"""
        header = self.file.read(27)
        if len(header) < 27:
            raise IOError("end of Ogg stream")
        if header[:4] != b"OggS":
            raise ValueError(text.ERR_OGG_INVALID_PAGE)
        n_segments = header[26]
        lacing = self.file.read(n_segments)
        if len(lacing) < n_segments:
            raise IOError("truncated Ogg page")
        body = self.file.read(sum(lacing))
        (page, _consumed) = Page.parse(header + lacing + body,
                                       self.verify_crc)
        return page

    def close(self):
        self.file.close()


class PageWriter:
    """writes Pages to a file object"""

    def __init__(self, file):
        self.file = file

    def write(self, page):
        self.file.write(page.build())

    def close(self):
        self.file.close()


class PacketReader:
    """assembles packets from a PageReader (reference ogg.py:23)"""

    def __init__(self, pagereader):
        self.pagereader = pagereader
        self.page = None
        self.segment_index = 0

    def read_segment(self):
        while (self.page is None or
               self.segment_index >= len(self.page.segments)):
            self.page = self.pagereader.read()
            self.segment_index = 0
        segment = self.page.segments[self.segment_index]
        self.segment_index += 1
        return segment

    def read_packet(self):
        """returns the next complete packet as bytes"""
        segments = [self.read_segment()]
        while len(segments[-1]) == 255:
            segments.append(self.read_segment())
        return b"".join(segments)

    def current_granule(self):
        return self.page.granule_position if self.page else 0

    def close(self):
        self.pagereader.close()


def packet_to_segments(packet):
    """yields the lacing segments for one packet (reference
    ogg.py:68-79): 255-byte chunks with a short (possibly empty)
    terminator segment"""
    if len(packet) == 0:
        yield b""
        return
    while len(packet) > 0:
        if len(packet) == 255:
            yield packet
            yield b""
            return
        yield packet[0:255]
        packet = packet[255:]


def packet_to_pages(packet, bitstream_serial_number,
                    starting_sequence_number=0):
    """yields Page objects holding one packet"""
    page = Page(False, False, False, 0, bitstream_serial_number,
                starting_sequence_number, [])
    for segment in packet_to_segments(packet):
        if page.full():
            yield page
            starting_sequence_number += 1
            page = Page(True, False, False, 0,
                        bitstream_serial_number,
                        starting_sequence_number, [])
        page.append(segment)
    yield page


def packets_to_pages(packets, bitstream_serial_number,
                     starting_sequence_number=0):
    """yields Page objects holding many packets, packing greedily"""
    page = Page(False, False, False, 0, bitstream_serial_number,
                starting_sequence_number, [])
    for packet in packets:
        for segment in packet_to_segments(packet):
            if page.full():
                yield page
                starting_sequence_number += 1
                page = Page(len(page.segments) > 0 and
                            len(page.segments[-1]) == 255,
                            False, False, 0,
                            bitstream_serial_number,
                            starting_sequence_number, [])
            page.append(segment)
    yield page
