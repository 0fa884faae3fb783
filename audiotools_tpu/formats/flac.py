"""FLAC format support: metadata blocks and the FlacAudio class.

Rebuild of the reference FLAC layer (``/root/reference/audiotools/flac.py``):
metadata block classes Flac_STREAMINFO (:360), Flac_PADDING,
Flac_APPLICATION, Flac_SEEKTABLE (:570), Flac_VORBISCOMMENT (:648),
Flac_CUESHEET (:739), Flac_PICTURE (:1028), the FlacMetaData container,
and FlacAudio (:1251) with compression modes "0"-"8" matching the
reference's exact option dicts (flac.py:1718-1764), from_pcm seektable
construction from encoder frame offsets (flac.py:1820-1835), and
WAVEFORMATEXTENSIBLE_CHANNEL_MASK vorbis-comment channel masks.
"""

from __future__ import annotations

from .. import text

import io
import struct

from .. import (EncodingError, InvalidFile, UnsupportedChannelCount,
                UnsupportedChannelMask)
from ..audiofile import (AudioFile, WaveContainer, AiffContainer,
                         MetaData, Image, Sheet, SheetTrack,
                         SheetIndex)
from ..pcmstream import ChannelMask, BufferedPCMReader, PCMReaderError
from ..bitstream import BitstreamReader, BitstreamWriter, BitstreamRecorder
from ..meta.vorbiscomment import VorbisComment
from ..utils.files import TemporaryFile


class InvalidFLAC(InvalidFile):
    pass


# ---------------------------------------------------------------------------
# metadata blocks
# ---------------------------------------------------------------------------

class Flac_STREAMINFO:
    BLOCK_ID = 0

    def __init__(self, minimum_block_size, maximum_block_size,
                 minimum_frame_size, maximum_frame_size,
                 sample_rate, channels, bits_per_sample,
                 total_samples, md5sum):
        self.minimum_block_size = minimum_block_size
        self.maximum_block_size = maximum_block_size
        self.minimum_frame_size = minimum_frame_size
        self.maximum_frame_size = maximum_frame_size
        self.sample_rate = sample_rate
        self.channels = channels
        self.bits_per_sample = bits_per_sample
        self.total_samples = total_samples
        self.md5sum = md5sum

    def copy(self):
        return Flac_STREAMINFO(self.minimum_block_size,
                               self.maximum_block_size,
                               self.minimum_frame_size,
                               self.maximum_frame_size,
                               self.sample_rate,
                               self.channels,
                               self.bits_per_sample,
                               self.total_samples,
                               self.md5sum)

    def __eq__(self, block):
        for attr in ["minimum_block_size", "maximum_block_size",
                     "minimum_frame_size", "maximum_frame_size",
                     "sample_rate", "channels", "bits_per_sample",
                     "total_samples", "md5sum"]:
            if ((not hasattr(block, attr)) or
                    (getattr(self, attr) != getattr(block, attr))):
                return False
        return True

    def __repr__(self):
        return "Flac_STREAMINFO(%s)" % ", ".join(
            "%s=%r" % (a, getattr(self, a))
            for a in ["minimum_block_size", "maximum_block_size",
                      "minimum_frame_size", "maximum_frame_size",
                      "sample_rate", "channels", "bits_per_sample",
                      "total_samples"])

    @classmethod
    def parse(cls, reader):
        values = reader.parse("16u 16u 24u 24u 20u 3u 5u 36U 16b")
        return cls(values[0], values[1], values[2], values[3],
                   values[4], values[5] + 1, values[6] + 1,
                   values[7], values[8])

    def build(self, writer):
        writer.build("16u 16u 24u 24u 20u 3u 5u 36U 16b",
                     [self.minimum_block_size,
                      self.maximum_block_size,
                      self.minimum_frame_size,
                      self.maximum_frame_size,
                      self.sample_rate,
                      self.channels - 1,
                      self.bits_per_sample - 1,
                      self.total_samples,
                      self.md5sum])

    def size(self):
        return 34

    def raw_info(self):
        from binascii import hexlify
        return "\n".join(
            ["STREAMINFO:",
             "  minimum block size = %d" % (self.minimum_block_size,),
             "  maximum block size = %d" % (self.maximum_block_size,),
             "  minimum frame size = %d" % (self.minimum_frame_size,),
             "  maximum frame size = %d" % (self.maximum_frame_size,),
             "  sample rate        = %d" % (self.sample_rate,),
             "  channels           = %d" % (self.channels,),
             "  bits-per-sample    = %d" % (self.bits_per_sample,),
             "  total samples      = %d" % (self.total_samples,),
             "  MD5 sum            = %s" %
             (hexlify(self.md5sum).decode('ascii'),)])


class Flac_PADDING:
    BLOCK_ID = 1

    def __init__(self, length):
        self.length = length

    def copy(self):
        return Flac_PADDING(self.length)

    def __repr__(self):
        return "Flac_PADDING(%d)" % (self.length,)

    @classmethod
    def parse(cls, reader, block_length):
        reader.skip_bytes(block_length)
        return cls(block_length)

    def build(self, writer):
        writer.write_bytes(b"\x00" * self.length)

    def size(self):
        return self.length

    def raw_info(self):
        return "PADDING:\n  length = %d" % (self.length,)


class Flac_APPLICATION:
    BLOCK_ID = 2

    def __init__(self, application_id, data):
        self.application_id = application_id
        self.data = data

    def copy(self):
        return Flac_APPLICATION(self.application_id, self.data)

    def __eq__(self, block):
        return (getattr(block, "application_id", None) ==
                self.application_id and
                getattr(block, "data", None) == self.data)

    def __repr__(self):
        return "Flac_APPLICATION(%r, ...)" % (self.application_id,)

    @classmethod
    def parse(cls, reader, block_length):
        return cls(reader.read_bytes(4),
                   reader.read_bytes(block_length - 4))

    def build(self, writer):
        writer.write_bytes(self.application_id)
        writer.write_bytes(self.data)

    def size(self):
        return 4 + len(self.data)

    def raw_info(self):
        return "APPLICATION:\n  %s (%d bytes)" % (
            self.application_id.decode('ascii', 'replace'),
            len(self.data))


class Flac_SEEKTABLE:
    BLOCK_ID = 3

    def __init__(self, seekpoints):
        """seekpoints is a list of
        (PCM frame offset, byte offset, PCM frame count) triples"""
        self.seekpoints = list(seekpoints)

    def copy(self):
        return Flac_SEEKTABLE(self.seekpoints)

    def __eq__(self, block):
        return getattr(block, "seekpoints", None) == self.seekpoints

    def __repr__(self):
        return "Flac_SEEKTABLE(%r)" % (self.seekpoints,)

    @classmethod
    def parse(cls, reader, total_seekpoints):
        return cls([tuple(reader.parse("64U 64U 16u"))
                    for _ in range(total_seekpoints)])

    def build(self, writer):
        for seekpoint in self.seekpoints:
            writer.build("64U 64U 16u", list(seekpoint))

    def size(self):
        return len(self.seekpoints) * 18

    def clean(self):
        """removes misplaced seekpoints; returns (block, fixes) pair"""
        fixes = []
        seekpoints = [s for s in self.seekpoints
                      if s != (0xFFFFFFFFFFFFFFFF, 0, 0)]
        cleaned = []
        for point in seekpoints:
            if len(cleaned) and (point[0] <= cleaned[-1][0]):
                fixes.append(text.CLEAN_FLAC_REMOVE_SEEKPOINT)
            else:
                cleaned.append(point)
        return (Flac_SEEKTABLE(cleaned), fixes)

    def raw_info(self):
        return "\n".join(
            ["SEEKTABLE:", "  sample offset / byte offset / frame count"] +
            ["  %d / %d / %d" % tuple(p) for p in self.seekpoints])


class Flac_VORBISCOMMENT(VorbisComment):
    BLOCK_ID = 4

    def copy(self):
        return Flac_VORBISCOMMENT(self.comment_strings[:],
                                  self.vendor_string)

    def __repr__(self):
        return "Flac_VORBISCOMMENT(%r, %r)" % (self.comment_strings,
                                               self.vendor_string)

    @classmethod
    def parse(cls, reader):
        """reads the block from a (big-endian) BitstreamReader;
        vorbis comment contents are little-endian"""
        vendor_length = struct.unpack(
            "<I", reader.read_bytes(4))[0]
        vendor_string = reader.read_bytes(vendor_length).decode(
            'utf-8', 'replace')
        total_comments = struct.unpack("<I", reader.read_bytes(4))[0]
        comments = []
        for _ in range(total_comments):
            comment_length = struct.unpack("<I", reader.read_bytes(4))[0]
            comments.append(reader.read_bytes(comment_length).decode(
                'utf-8', 'replace'))
        return cls(comments, vendor_string)

    def build(self, writer):
        vendor = self.vendor_string.encode('utf-8')
        writer.write_bytes(struct.pack("<I", len(vendor)))
        writer.write_bytes(vendor)
        writer.write_bytes(struct.pack("<I", len(self.comment_strings)))
        for comment in self.comment_strings:
            comment = comment.encode('utf-8')
            writer.write_bytes(struct.pack("<I", len(comment)))
            writer.write_bytes(comment)

    def size(self):
        return (4 + len(self.vendor_string.encode('utf-8')) + 4 +
                sum(4 + len(c.encode('utf-8'))
                    for c in self.comment_strings))

    @classmethod
    def converted(cls, metadata):
        """converts metadata from another class to Flac_VORBISCOMMENT"""
        from .. import VERSION
        if metadata is None:
            return None
        elif isinstance(metadata, Flac_VORBISCOMMENT):
            return cls(metadata.comment_strings[:],
                       metadata.vendor_string)
        elif isinstance(metadata, VorbisComment):
            return cls(metadata.comment_strings[:],
                       metadata.vendor_string)
        else:
            comment_strings = []
            for (attr, key) in cls.ATTRIBUTE_MAP.items():
                value = getattr(metadata, attr)
                if value is not None:
                    comment_strings.append("%s=%s" % (key, value))
            return cls(comment_strings,
                       "tpu-audio-tools %s" % (VERSION,))


class Flac_CUESHEET:
    BLOCK_ID = 5

    def __init__(self, catalog_number, lead_in_samples, is_cdda, tracks):
        """tracks is a list of Flac_CUESHEET_track objects"""
        self.catalog_number = catalog_number
        self.lead_in_samples = lead_in_samples
        self.is_cdda = is_cdda
        self.tracks = list(tracks)

    def copy(self):
        return Flac_CUESHEET(self.catalog_number,
                             self.lead_in_samples,
                             self.is_cdda,
                             [t.copy() for t in self.tracks])

    def __eq__(self, sheet):
        if isinstance(sheet, Flac_CUESHEET):
            return ((self.catalog_number == sheet.catalog_number) and
                    (self.lead_in_samples == sheet.lead_in_samples) and
                    (self.is_cdda == sheet.is_cdda) and
                    (self.tracks == sheet.tracks))
        else:
            # compare against Sheet-compatible objects
            try:
                return (
                    (self.catalog() == sheet.catalog()) and
                    (list(self.sheet_tracks()) == list(sheet.tracks())))
            except AttributeError:
                return False

    def __repr__(self):
        return "Flac_CUESHEET(%r, %r, %r, %r)" % (
            self.catalog_number, self.lead_in_samples,
            self.is_cdda, self.tracks)

    @classmethod
    def parse(cls, reader):
        (catalog_number, lead_in_samples, is_cdda) = \
            reader.parse("128b 64U 1u 2071p")
        track_count = reader.read(8)
        return cls(catalog_number, lead_in_samples, is_cdda,
                   [Flac_CUESHEET_track.parse(reader)
                    for _ in range(track_count)])

    def build(self, writer):
        writer.build("128b 64U 1u 2071p",
                     [self.catalog_number,
                      self.lead_in_samples,
                      self.is_cdda])
        writer.write(8, len(self.tracks))
        for track in self.tracks:
            track.build(writer)

    def size(self):
        return (128 + 8 + (1 + 2071) // 8 + 1 +
                sum(t.size() for t in self.tracks))

    @classmethod
    def converted(cls, sheet, total_pcm_frames, sample_rate):
        """converts a Sheet-compatible object to Flac_CUESHEET"""
        catalog = sheet.catalog()
        if catalog is None:
            catalog_number = b"\x00" * 128
        else:
            catalog = catalog.encode('ascii', 'replace') \
                if isinstance(catalog, str) else catalog
            catalog_number = catalog + b"\x00" * (128 - len(catalog))

        tracks = [Flac_CUESHEET_track.converted(t, sample_rate)
                  for t in sheet.tracks()]
        # lead-out track
        tracks.append(Flac_CUESHEET_track(total_pcm_frames, 170,
                                          b"\x00" * 12, 0, 0, []))
        return cls(catalog_number, sample_rate * 2, 1, tracks)

    def catalog(self):
        """returns the catalog number as a plain string, or None"""
        catalog = self.catalog_number.rstrip(b"\x00")
        if len(catalog):
            return catalog.decode('ascii', 'replace')
        else:
            return None

    def sheet_tracks(self):
        """yields SheetTrack objects (excluding lead-out)"""
        for track in self.tracks:
            if track.number != 170:
                yield track.to_sheet_track(self.__sample_rate__
                                           if hasattr(
                                               self, "__sample_rate__")
                                           else 44100)

    def track(self, track_number):
        for track in self.sheet_tracks():
            if track.number() == track_number:
                return track
        raise KeyError(track_number)

    def image_formatted(self):
        return True

    def pcm_lengths(self, total_pcm_frames, sample_rate):
        """yields per-track lengths in PCM frames"""
        offsets = [t.track_offset for t in self.tracks
                   if t.number != 170]
        if len(offsets) == 0:
            return
        for (start, end) in zip(offsets, offsets[1:]):
            total_pcm_frames -= (end - start)
            yield (end - start)
        yield total_pcm_frames

    def raw_info(self):
        return "\n".join(
            ["CUESHEET:",
             "  catalog number = %s" % (self.catalog(),),
             "  lead-in samples = %d" % (self.lead_in_samples,),
             "  is CDDA = %d" % (self.is_cdda,)] +
            ["  " + repr(t) for t in self.tracks])


class Flac_CUESHEET_track:
    def __init__(self, track_offset, number, ISRC,
                 track_type, pre_emphasis, index_points):
        self.track_offset = track_offset
        self.number = number
        self.ISRC = ISRC
        self.track_type = track_type
        self.pre_emphasis = pre_emphasis
        self.index_points = list(index_points)

    def copy(self):
        return Flac_CUESHEET_track(self.track_offset, self.number,
                                   self.ISRC, self.track_type,
                                   self.pre_emphasis,
                                   [i.copy() for i in self.index_points])

    def __eq__(self, track):
        for attr in ["track_offset", "number", "ISRC", "track_type",
                     "pre_emphasis", "index_points"]:
            if ((not hasattr(track, attr)) or
                    (getattr(self, attr) != getattr(track, attr))):
                return False
        return True

    def __repr__(self):
        return "Flac_CUESHEET_track(%r, %r, %r, %r, %r, %r)" % (
            self.track_offset, self.number, self.ISRC,
            self.track_type, self.pre_emphasis, self.index_points)

    @classmethod
    def parse(cls, reader):
        (track_offset, number, ISRC, track_type, pre_emphasis) = \
            reader.parse("64U 8u 12b 1u 1u 110p")
        index_count = reader.read(8)
        return cls(track_offset, number, ISRC, track_type, pre_emphasis,
                   [Flac_CUESHEET_index.parse(reader)
                    for _ in range(index_count)])

    def build(self, writer):
        writer.build("64U 8u 12b 1u 1u 110p",
                     [self.track_offset, self.number, self.ISRC,
                      self.track_type, self.pre_emphasis])
        writer.write(8, len(self.index_points))
        for index in self.index_points:
            index.build(writer)

    def size(self):
        return (8 + 1 + 12 + (1 + 1 + 110) // 8 + 1 +
                9 * len(self.index_points))

    @classmethod
    def converted(cls, sheet_track, sample_rate):
        """converts a SheetTrack object to Flac_CUESHEET_track"""
        ISRC = sheet_track.ISRC()
        if ISRC is None:
            ISRC = b"\x00" * 12
        else:
            if isinstance(ISRC, str):
                ISRC = ISRC.encode('ascii', 'replace')
            ISRC = ISRC + b"\x00" * (12 - len(ISRC))

        indexes = list(sheet_track.indexes())
        track_offset = int(min(i.offset() for i in indexes) * sample_rate)
        return cls(track_offset,
                   sheet_track.number(),
                   ISRC,
                   0 if sheet_track.audio() else 1,
                   0,
                   [Flac_CUESHEET_index(
                       int((i.offset()) * sample_rate) - track_offset,
                       i.number()) for i in indexes])

    def to_sheet_track(self, sample_rate):
        from fractions import Fraction
        ISRC = self.ISRC.rstrip(b"\x00")
        return SheetTrack(
            self.number,
            [SheetIndex(i.number,
                        Fraction(self.track_offset + i.offset,
                                 sample_rate))
             for i in self.index_points],
            self.track_type == 0,
            ISRC.decode('ascii', 'replace') if len(ISRC) else None)


class Flac_CUESHEET_index:
    def __init__(self, offset, number):
        self.offset = offset
        self.number = number

    def copy(self):
        return Flac_CUESHEET_index(self.offset, self.number)

    def __eq__(self, index):
        return ((getattr(index, "offset", None) == self.offset) and
                (getattr(index, "number", None) == self.number))

    def __repr__(self):
        return "Flac_CUESHEET_index(%r, %r)" % (self.offset, self.number)

    @classmethod
    def parse(cls, reader):
        (offset, number) = reader.parse("64U 8u 24p")
        return cls(offset, number)

    def build(self, writer):
        writer.build("64U 8u 24p", [self.offset, self.number])


class Flac_PICTURE(Image):
    BLOCK_ID = 6

    def __init__(self, picture_type, mime_type, description,
                 width, height, color_depth, color_count, data):
        self.__dict__["picture_type"] = picture_type
        Image.__init__(self,
                       data=data,
                       mime_type=mime_type,
                       width=width,
                       height=height,
                       color_depth=color_depth,
                       color_count=color_count,
                       description=description,
                       type={3: 0,   # front cover
                             4: 1,   # back cover
                             5: 2,   # leaflet page
                             6: 3,   # media
                             }.get(picture_type, 4))

    def copy(self):
        return Flac_PICTURE(self.picture_type, self.mime_type,
                            self.description, self.width, self.height,
                            self.color_depth, self.color_count, self.data)

    def __repr__(self):
        return ("Flac_PICTURE(picture_type=%r, mime_type=%r, width=%r, "
                "height=%r)" % (self.picture_type, self.mime_type,
                                self.width, self.height))

    def clean(self):
        """returns a (Flac_PICTURE, fixes) pair with the metadata
        fields corrected from the actual image data
        (reference flac.py Flac_PICTURE.clean)"""
        from ..meta.image import image_metrics

        img = image_metrics(self.data)
        if ((self.mime_type != img.mime_type) or
                (self.width != img.width) or
                (self.height != img.height) or
                (self.color_depth != img.bits_per_pixel) or
                (self.color_count != img.color_count)):
            return (Flac_PICTURE(self.picture_type, img.mime_type,
                                 self.description, img.width,
                                 img.height, img.bits_per_pixel,
                                 img.color_count, self.data),
                    [text.CLEAN_FIX_IMAGE_FIELDS])
        return (self, [])

    @classmethod
    def parse(cls, reader):
        picture_type = reader.read(32)
        mime_type = reader.read_bytes(reader.read(32)).decode('ascii',
                                                              'replace')
        description = reader.read_bytes(reader.read(32)).decode('utf-8',
                                                                'replace')
        width = reader.read(32)
        height = reader.read(32)
        color_depth = reader.read(32)
        color_count = reader.read(32)
        data = reader.read_bytes(reader.read(32))
        return cls(picture_type, mime_type, description,
                   width, height, color_depth, color_count, data)

    def build(self, writer):
        writer.write(32, self.picture_type)
        mime = self.mime_type.encode('ascii')
        writer.write(32, len(mime))
        writer.write_bytes(mime)
        description = self.description.encode('utf-8')
        writer.write(32, len(description))
        writer.write_bytes(description)
        writer.write(32, self.width)
        writer.write(32, self.height)
        writer.write(32, self.color_depth)
        writer.write(32, self.color_count)
        writer.write(32, len(self.data))
        writer.write_bytes(self.data)

    def size(self):
        return (4 * 8 +
                len(self.mime_type.encode('ascii')) +
                len(self.description.encode('utf-8')) +
                len(self.data))

    @classmethod
    def converted(cls, image):
        """converts an Image object to Flac_PICTURE"""
        return cls(picture_type={0: 3, 1: 4, 2: 5, 3: 6}.get(
                       image.type, 0),
                   mime_type=image.mime_type,
                   description=image.description,
                   width=image.width,
                   height=image.height,
                   color_depth=image.color_depth,
                   color_count=image.color_count,
                   data=image.data)

    def raw_info(self):
        return "\n".join(
            ["PICTURE:",
             "  picture type = %d" % (self.picture_type,),
             "  MIME type    = %s" % (self.mime_type,),
             "  width        = %d" % (self.width,),
             "  height       = %d" % (self.height,),
             "  color depth  = %d" % (self.color_depth,),
             "  color count  = %d" % (self.color_count,),
             "  bytes        = %d" % (len(self.data),)])


BLOCK_CLASSES = {0: Flac_STREAMINFO,
                 1: Flac_PADDING,
                 2: Flac_APPLICATION,
                 3: Flac_SEEKTABLE,
                 4: Flac_VORBISCOMMENT,
                 5: Flac_CUESHEET,
                 6: Flac_PICTURE}


class FlacMetaData(MetaData):
    """a container for FLAC metadata blocks

    delegates MetaData fields to its VORBISCOMMENT block and
    images to its PICTURE blocks"""

    def __init__(self, blocks):
        self.__dict__["block_list"] = list(blocks)

    @classmethod
    def converted(cls, metadata):
        """converts metadata from another class to FlacMetaData"""
        if metadata is None:
            return None
        elif isinstance(metadata, FlacMetaData):
            return cls([block.copy() for block in metadata.block_list])
        else:
            return cls([Flac_VORBISCOMMENT.converted(metadata)] +
                       [Flac_PICTURE.converted(image)
                        for image in metadata.images()] +
                       [Flac_PADDING(4096)])

    def added_removed_blocks(self):
        return self.block_list

    def blocks(self):
        """yields all current metadata blocks"""
        return iter(self.block_list)

    def has_block(self, block_id):
        """returns True if the given block ID is present"""
        return block_id in (b.BLOCK_ID for b in self.block_list)

    def add_block(self, block):
        """adds the given block to this metadata, in ID order"""
        # keep blocks in ascending BLOCK_ID order, PADDING last
        my_blocks = self.block_list
        if block.BLOCK_ID == Flac_PADDING.BLOCK_ID:
            my_blocks.append(block)
        else:
            for (i, b) in enumerate(my_blocks):
                if (b.BLOCK_ID > block.BLOCK_ID or
                        b.BLOCK_ID == Flac_PADDING.BLOCK_ID):
                    my_blocks.insert(i, block)
                    break
            else:
                my_blocks.append(block)

    def get_block(self, block_id):
        """returns the first instance of the given block ID

        may raise IndexError if the block is not present"""
        for block in self.block_list:
            if block.BLOCK_ID == block_id:
                return block
        raise IndexError()

    def get_blocks(self, block_id):
        """returns all instances of the given block ID as a list"""
        return [b for b in self.block_list if b.BLOCK_ID == block_id]

    def replace_blocks(self, block_id, blocks):
        """replaces all instances of the given block ID
        with the given list of blocks"""
        new_blocks = []
        inserted = False
        for block in self.block_list:
            if block.BLOCK_ID == block_id:
                if not inserted:
                    new_blocks.extend(blocks)
                    inserted = True
            else:
                new_blocks.append(block)
        if not inserted:
            for block in blocks:
                self.add_block(block)
            return
        self.__dict__["block_list"] = new_blocks

    def __repr__(self):
        return "FlacMetaData(%r)" % (self.block_list,)

    def __getattr__(self, attr):
        if attr in MetaData.FIELDS:
            try:
                return getattr(self.get_block(
                    Flac_VORBISCOMMENT.BLOCK_ID), attr)
            except IndexError:
                return None
        else:
            try:
                return self.__dict__[attr]
            except KeyError:
                raise AttributeError(attr)

    def __setattr__(self, attr, value):
        if attr in MetaData.FIELDS:
            try:
                vorbis_comment = self.get_block(
                    Flac_VORBISCOMMENT.BLOCK_ID)
            except IndexError:
                from .. import VERSION
                vorbis_comment = Flac_VORBISCOMMENT(
                    [], "tpu-audio-tools %s" % (VERSION,))
                self.add_block(vorbis_comment)
            setattr(vorbis_comment, attr, value)
        else:
            self.__dict__[attr] = value

    def __delattr__(self, attr):
        if attr in MetaData.FIELDS:
            try:
                delattr(self.get_block(Flac_VORBISCOMMENT.BLOCK_ID),
                        attr)
            except IndexError:
                pass
        else:
            try:
                del self.__dict__[attr]
            except KeyError:
                raise AttributeError(attr)

    @classmethod
    def supports_images(cls):
        return True

    def images(self):
        return self.get_blocks(Flac_PICTURE.BLOCK_ID)

    def add_image(self, image):
        self.add_block(Flac_PICTURE.converted(image))

    def delete_image(self, image):
        self.replace_blocks(
            Flac_PICTURE.BLOCK_ID,
            [p for p in self.images() if p != image])

    def clean(self):
        """returns a (FlacMetaData, fixes) cleaned pair"""
        fixes_performed = []
        new_blocks = []
        seen = set()
        for block in self.block_list:
            if block.BLOCK_ID == Flac_VORBISCOMMENT.BLOCK_ID:
                if block.BLOCK_ID in seen:
                    fixes_performed.append(
                        text.CLEAN_FLAC_MULTIPLE_VORBISCOMMENT)
                    continue
                (cleaned, fixes) = block.clean()
                cleaned = Flac_VORBISCOMMENT(cleaned.comment_strings,
                                             cleaned.vendor_string)
                fixes_performed.extend(fixes)
                new_blocks.append(cleaned)
            elif block.BLOCK_ID == Flac_SEEKTABLE.BLOCK_ID:
                if block.BLOCK_ID in seen:
                    fixes_performed.append(
                        text.CLEAN_FLAC_MULTIPLE_SEEKTABLE)
                    continue
                (cleaned, fixes) = block.clean()
                fixes_performed.extend(fixes)
                new_blocks.append(cleaned)
            elif (block.BLOCK_ID == Flac_STREAMINFO.BLOCK_ID and
                    block.BLOCK_ID in seen):
                fixes_performed.append(text.CLEAN_FLAC_MULTIPLE_STREAMINFO)
                continue
            else:
                new_blocks.append(block)
            seen.add(block.BLOCK_ID)
        return (FlacMetaData(new_blocks), fixes_performed)

    def raw_info(self):
        from os import linesep
        return linesep.join(b.raw_info() for b in self.block_list
                            if hasattr(b, "raw_info"))

    @classmethod
    def parse(cls, reader):
        """returns a FlacMetaData object from a BitstreamReader
        positioned past the 'fLaC' marker"""
        block_list = []
        last = 0
        while last != 1:
            (last, block_type, block_length) = reader.parse("1u 7u 24u")
            if block_type == 0:
                block_list.append(Flac_STREAMINFO.parse(reader))
            elif block_type == 1:
                block_list.append(Flac_PADDING.parse(reader,
                                                     block_length))
            elif block_type == 2:
                block_list.append(Flac_APPLICATION.parse(reader,
                                                         block_length))
            elif block_type == 3:
                block_list.append(Flac_SEEKTABLE.parse(reader,
                                                       block_length // 18))
            elif block_type == 4:
                block_list.append(Flac_VORBISCOMMENT.parse(reader))
            elif block_type == 5:
                block_list.append(Flac_CUESHEET.parse(reader))
            elif block_type == 6:
                block_list.append(Flac_PICTURE.parse(reader))
            elif block_type == 7:
                raise ValueError("invalid FLAC metadata block type")
            else:
                reader.skip_bytes(block_length)
        return cls(block_list)

    def build(self, writer):
        """writes all metadata blocks (with headers) to the writer"""
        from ..audiofile import AudioFile  # noqa: F401
        blocks = [b for b in self.block_list
                  if b.size() < (1 << 24)]
        for (i, block) in enumerate(blocks):
            writer.build("1u 7u 24u",
                         [1 if (i == len(blocks) - 1) else 0,
                          block.BLOCK_ID,
                          block.size()])
            block.build(writer)

    def size(self):
        """total size of all blocks, including headers"""
        return sum(4 + b.size() for b in self.block_list
                   if b.size() < (1 << 24))


class FlacAudio(WaveContainer, AiffContainer):
    """a Free Lossless Audio Codec file (stores foreign WAV/AIFF
    chunks in APPLICATION blocks, reference flac.py:1251)"""

    SUFFIX = "flac"
    NAME = SUFFIX
    DESCRIPTION = "Free Lossless Audio Codec"
    COMPRESSION_MODES = tuple(map(str, range(0, 9)))
    COMPRESSION_DESCRIPTIONS = {"0": text.COMP_FLAC_0,
                                "8": text.COMP_FLAC_8}
    DEFAULT_COMPRESSION = "8"

    # the reference's exact per-mode options (flac.py:1718-1764)
    COMPRESSION_OPTIONS = {
        "0": {"block_size": 1152, "max_lpc_order": 0,
              "min_residual_partition_order": 0,
              "max_residual_partition_order": 3},
        "1": {"block_size": 1152, "max_lpc_order": 0,
              "adaptive_mid_side": True,
              "min_residual_partition_order": 0,
              "max_residual_partition_order": 3},
        "2": {"block_size": 1152, "max_lpc_order": 0,
              "exhaustive_model_search": True,
              "min_residual_partition_order": 0,
              "max_residual_partition_order": 3},
        "3": {"block_size": 4096, "max_lpc_order": 6,
              "min_residual_partition_order": 0,
              "max_residual_partition_order": 4},
        "4": {"block_size": 4096, "max_lpc_order": 8,
              "adaptive_mid_side": True,
              "min_residual_partition_order": 0,
              "max_residual_partition_order": 4},
        "5": {"block_size": 4096, "max_lpc_order": 8,
              "mid_side": True,
              "min_residual_partition_order": 0,
              "max_residual_partition_order": 5},
        "6": {"block_size": 4096, "max_lpc_order": 8,
              "mid_side": True,
              "min_residual_partition_order": 0,
              "max_residual_partition_order": 6},
        "7": {"block_size": 4096, "max_lpc_order": 8,
              "mid_side": True, "exhaustive_model_search": True,
              "min_residual_partition_order": 0,
              "max_residual_partition_order": 6},
        "8": {"block_size": 4096, "max_lpc_order": 12,
              "mid_side": True, "exhaustive_model_search": True,
              "min_residual_partition_order": 0,
              "max_residual_partition_order": 6}}

    METADATA_CLASS = FlacMetaData

    def __init__(self, filename):
        AudioFile.__init__(self, filename)

        try:
            with open(filename, "rb") as f:
                if f.read(4) != b"fLaC":
                    # check for ID3v2-wrapped FLAC (possibly
                    # stacked tags, reference flac-id3-2.flac)
                    from ..meta.id3 import skip_id3v2_comment
                    f.seek(0, 0)
                    skipped = skip_id3v2_comment(f)
                    if skipped == 0 or f.read(4) != b"fLaC":
                        raise InvalidFLAC(text.ERR_FLAC_INVALID_FILE)
                    self.__stream_offset__ = skipped + 4
                else:
                    self.__stream_offset__ = 4

                reader = BitstreamReader(f, False)
                last = 0
                streaminfo = None
                while last != 1:
                    (last, block_type, block_length) = \
                        reader.parse("1u 7u 24u")
                    if block_type == 0:
                        streaminfo = Flac_STREAMINFO.parse(reader)
                        break
                    else:
                        reader.skip_bytes(block_length)

                if streaminfo is None:
                    raise InvalidFLAC("STREAMINFO block not found")
                self.__streaminfo__ = streaminfo
        except IOError as err:
            raise InvalidFLAC(str(err))

    def lossless(self):
        return True

    def bits_per_sample(self):
        return self.__streaminfo__.bits_per_sample

    def channels(self):
        return self.__streaminfo__.channels

    def sample_rate(self):
        return self.__streaminfo__.sample_rate

    def total_frames(self):
        return self.__streaminfo__.total_samples

    def seekable(self):
        return True

    def channel_mask(self):
        """returns a ChannelMask object of this track's channel layout"""
        # try WAVEFORMATEXTENSIBLE_CHANNEL_MASK from the Vorbis comment
        try:
            metadata = self.get_metadata()
            if metadata is not None:
                vorbis = metadata.get_block(Flac_VORBISCOMMENT.BLOCK_ID)
                if "WAVEFORMATEXTENSIBLE_CHANNEL_MASK" in vorbis:
                    try:
                        return ChannelMask(int(
                            vorbis["WAVEFORMATEXTENSIBLE_CHANNEL_MASK"][0],
                            16))
                    except ValueError:
                        pass
        except (IndexError, IOError):
            pass

        # fall back to channel-count defaults
        return ChannelMask(
            {1: 0x0004, 2: 0x0003, 3: 0x0007, 4: 0x0033,
             5: 0x0037, 6: 0x003F}.get(self.channels(), 0))

    def metadata_length(self):
        """returns the length of all FLAC metadata blocks in bytes,
        not including the 4-byte "fLaC" header
        (reference flac.py:1554)"""
        with open(self.filename, "rb") as f:
            f.seek(self.__stream_offset__ - 4, 0)
            if f.read(4) != b"fLaC":
                raise InvalidFLAC(text.ERR_FLAC_INVALID_FILE)
            reader = BitstreamReader(f, False)
            counter = 0
            stop = 0
            while stop == 0:
                (stop, _block_id, length) = reader.parse("1u 7u 24u")
                counter += 4 + length
                reader.skip_bytes(length)
            return counter

    def get_metadata(self):
        """returns a FlacMetaData object, or None"""
        with open(self.filename, "rb") as f:
            f.seek(self.__stream_offset__ - 4, 0)
            if f.read(4) != b"fLaC":
                raise IOError(text.ERR_FLAC_INVALID_FILE)
            return FlacMetaData.parse(BitstreamReader(f, False))

    def update_metadata(self, metadata):
        """writes FlacMetaData blocks back to the file"""
        if metadata is None:
            raise ValueError("metadata not from audio file")
        if not isinstance(metadata, FlacMetaData):
            raise ValueError("metadata not from audio file")

        # measure the current metadata region
        with open(self.filename, "rb") as f:
            stream_prefix = f.read(self.__stream_offset__ - 4)
            if f.read(4) != b"fLaC":
                raise IOError(text.ERR_FLAC_INVALID_FILE)
            reader = BitstreamReader(f, False)
            last = 0
            while last != 1:
                (last, block_type, block_length) = \
                    reader.parse("1u 7u 24u")
                reader.skip_bytes(block_length)
            frames_offset = f.tell()
            old_metadata_size = frames_offset - self.__stream_offset__

        new_size = metadata.size()

        if new_size == old_metadata_size:
            # rewrite in place
            with open(self.filename, "r+b") as f:
                f.seek(self.__stream_offset__, 0)
                writer = BitstreamWriter(f, False)
                metadata.build(writer)
                writer.flush()
        elif ((new_size < old_metadata_size) and
              metadata.has_block(Flac_PADDING.BLOCK_ID)):
            # grow padding to fill the existing space
            padding = metadata.get_block(Flac_PADDING.BLOCK_ID)
            padding.length += old_metadata_size - new_size
            with open(self.filename, "r+b") as f:
                f.seek(self.__stream_offset__, 0)
                writer = BitstreamWriter(f, False)
                metadata.build(writer)
                writer.flush()
        else:
            # shrink padding if possible to fit the existing space
            if metadata.has_block(Flac_PADDING.BLOCK_ID):
                padding = metadata.get_block(Flac_PADDING.BLOCK_ID)
                excess = new_size - old_metadata_size
                if padding.length >= excess:
                    padding.length -= excess
                    with open(self.filename, "r+b") as f:
                        f.seek(self.__stream_offset__, 0)
                        writer = BitstreamWriter(f, False)
                        metadata.build(writer)
                        writer.flush()
                    return

            # full rewrite via temporary file
            with open(self.filename, "rb") as f:
                f.seek(frames_offset, 0)
                new_file = TemporaryFile(self.filename)
                new_file.write(stream_prefix)
                new_file.write(b"fLaC")
                writer = BitstreamWriter(new_file, False)
                metadata.build(writer)
                writer.flush()
                while True:
                    chunk = f.read(0x100000)
                    if not chunk:
                        break
                    new_file.write(chunk)
                new_file.close()

    def set_metadata(self, metadata):
        """takes a MetaData object and sets this track's metadata"""
        if metadata is None:
            return
        new_metadata = FlacMetaData.converted(metadata)

        old_metadata = self.get_metadata()

        # preserve STREAMINFO, SEEKTABLE, CUESHEET, APPLICATION blocks
        # and the original vendor string
        for block_id in [Flac_STREAMINFO.BLOCK_ID,
                         Flac_SEEKTABLE.BLOCK_ID,
                         Flac_CUESHEET.BLOCK_ID,
                         Flac_APPLICATION.BLOCK_ID]:
            new_metadata.replace_blocks(
                block_id, old_metadata.get_blocks(block_id))

        try:
            new_vorbis = new_metadata.get_block(
                Flac_VORBISCOMMENT.BLOCK_ID)
            old_vorbis = old_metadata.get_blocks(
                Flac_VORBISCOMMENT.BLOCK_ID)
            if len(old_vorbis):
                new_vorbis.__dict__["vendor_string"] = \
                    old_vorbis[0].vendor_string
                # preserve channel mask hints
                if "WAVEFORMATEXTENSIBLE_CHANNEL_MASK" in old_vorbis[0]:
                    new_vorbis["WAVEFORMATEXTENSIBLE_CHANNEL_MASK"] = \
                        old_vorbis[0]["WAVEFORMATEXTENSIBLE_CHANNEL_MASK"]
        except IndexError:
            pass

        # ensure a PADDING block is present for future updates
        if not new_metadata.has_block(Flac_PADDING.BLOCK_ID):
            new_metadata.add_block(Flac_PADDING(4096))

        self.update_metadata(new_metadata)

    def delete_metadata(self):
        """deletes the track's MetaData"""
        from .. import VERSION
        metadata = self.get_metadata()
        metadata.replace_blocks(
            Flac_VORBISCOMMENT.BLOCK_ID,
            [Flac_VORBISCOMMENT([],
                                "tpu-audio-tools %s" % (VERSION,))])
        metadata.replace_blocks(Flac_PICTURE.BLOCK_ID, [])
        self.update_metadata(metadata)

    def to_pcm(self):
        """returns a PCMReader object of this file's PCM data"""
        from ..codecs.flac import decoder_for_file
        try:
            f = open(self.filename, "rb")
            f.seek(self.__stream_offset__ - 4, 0)
            return decoder_for_file(f, int(self.channel_mask()))
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
        from ..utils.config import default_quality

        if (compression is None) or (compression not in
                                     cls.COMPRESSION_MODES):
            compression = default_quality(cls.NAME) or \
                cls.DEFAULT_COMPRESSION

        encoding_options = cls.COMPRESSION_OPTIONS[compression]

        if pcmreader.channels > 8:
            raise UnsupportedChannelCount(filename, pcmreader.channels)

        if int(pcmreader.channel_mask) == 0:
            if pcmreader.channels <= 6:
                channel_mask = {1: 0x0004, 2: 0x0003, 3: 0x0007,
                                4: 0x0033, 5: 0x0037,
                                6: 0x003F}[pcmreader.channels]
            else:
                channel_mask = 0
        elif (int(pcmreader.channel_mask) not in
              (0x0001, 0x0004, 0x0003, 0x0007, 0x0033, 0x0603,
               0x0037, 0x0607, 0x003F, 0x060F)):
            raise UnsupportedChannelMask(filename,
                                         int(pcmreader.channel_mask))
        else:
            channel_mask = int(pcmreader.channel_mask)

        if total_pcm_frames is not None:
            expected_seekpoints = (
                (total_pcm_frames // (pcmreader.sample_rate * 10)) +
                (1 if (total_pcm_frames %
                       (pcmreader.sample_rate * 10)) else 0))
            padding_size = 4096 + 4 + (expected_seekpoints * 18)
        else:
            padding_size = 4096

        if encoding_function is None:
            from ..codecs.flac import encode_flac as encoding_function

        try:
            offsets = encoding_function(
                filename,
                pcmreader=BufferedPCMReader(pcmreader),
                padding_size=padding_size,
                **encoding_options)
            flac = FlacAudio(filename)
            metadata = flac.get_metadata()
            assert metadata is not None

            # generate SEEKTABLE from encoder offsets
            seekpoint_interval = pcmreader.sample_rate * 10
            metadata.add_block(
                seektable_from_offsets(offsets, seekpoint_interval))

            # record explicit channel masks for unusual layouts
            if (((pcmreader.channels > 2) or
                 (pcmreader.bits_per_sample > 16)) and
                    (channel_mask != 0)):
                try:
                    vorbis = metadata.get_block(
                        Flac_VORBISCOMMENT.BLOCK_ID)
                except IndexError:
                    from .. import VERSION
                    vorbis = Flac_VORBISCOMMENT(
                        [], "tpu-audio-tools %s" % (VERSION,))
                    metadata.add_block(vorbis)
                vorbis["WAVEFORMATEXTENSIBLE_CHANNEL_MASK"] = [
                    "0x%.4X" % (channel_mask,)]

            flac.update_metadata(metadata)
            return flac
        except (IOError, ValueError) as err:
            cls.__unlink__(filename)
            raise EncodingError(str(err))
        except Exception:
            cls.__unlink__(filename)
            raise
        finally:
            try:
                pcmreader.close()
            except Exception:
                pass

    def seektable(self, offsets=None, seekpoint_interval=None):
        """returns a new Flac_SEEKTABLE computed from the file itself

        walks the frame stream with the native decoder, recording the
        true (byte offset, PCM frames) pair of every frame (reference
        flac.py's from_pcm path computes the same offsets at encode
        time)"""
        if seekpoint_interval is None:
            seekpoint_interval = self.sample_rate() * 10
        if offsets is None:
            offsets = self.__walk_frame_offsets__()
        return seektable_from_offsets(offsets, seekpoint_interval)

    def __walk_frame_offsets__(self):
        """returns (byte_offset, pcm_frames) per frame by walking the
        stream frame-by-frame with the native decoder"""
        from .. import _native
        offsets = []
        # decoding with max_samples = one maximum block yields exactly
        # one frame per call (a second frame would exceed the cap)
        max_block = self.__streaminfo__.maximum_block_size or 65536
        with open(self.filename, "rb") as f:
            f.seek(self.__stream_offset__, 0)
            reader = BitstreamReader(f, False)
            last = 0
            while last != 1:
                (last, _btype, blen) = reader.parse("1u 7u 24u")
                reader.skip_bytes(blen)
            data = f.read()
        pos = 0
        while pos < len(data):
            # decode exactly one frame to learn its byte length
            (samples, consumed) = _native.flac_decode(
                data[pos:], self.__streaminfo__.bits_per_sample,
                self.__streaminfo__.channels, max_block,
                verify_crc=False)
            if consumed == 0 or samples.shape[0] == 0:
                break
            offsets.append((pos, samples.shape[0]))
            pos += consumed
        return offsets

    def get_cuesheet(self):
        """returns the embedded Flac_CUESHEET, or None"""
        metadata = self.get_metadata()
        try:
            cuesheet = metadata.get_block(Flac_CUESHEET.BLOCK_ID)
            cuesheet.__sample_rate__ = self.sample_rate()
            return cuesheet
        except IndexError:
            return None

    def set_cuesheet(self, cuesheet):
        """imports cuesheet data from a Sheet object"""
        if cuesheet is None:
            return
        metadata = self.get_metadata()
        metadata.replace_blocks(
            Flac_CUESHEET.BLOCK_ID,
            [Flac_CUESHEET.converted(cuesheet,
                                     self.total_frames(),
                                     self.sample_rate())])
        self.update_metadata(metadata)

    def verify(self, progress=None):
        """decodes the entire file, verifying CRCs and the stream MD5"""
        from .. import InvalidFile

        # check STREAMINFO frame counts vs metadata
        try:
            return AudioFile.verify(self, progress)
        except (IOError, ValueError) as err:
            raise InvalidFile(str(err))

    def clean(self, output_filename=None):
        """cleans the file of known data and metadata problems"""
        metadata = self.get_metadata()
        if metadata is None:
            return []
        (cleaned, fixes) = metadata.clean()
        if output_filename is not None:
            with open(self.filename, "rb") as old_file:
                with open(output_filename, "wb") as new_file:
                    new_file.write(old_file.read())
            new_track = FlacAudio(output_filename)
            new_track.update_metadata(cleaned)
        return fixes

    @classmethod
    def supports_replay_gain(cls):
        return True

    @classmethod
    def lossless_replay_gain(cls):
        return True

    @classmethod
    def can_add_replay_gain(cls, audiofiles):
        from ..pcmstream import ChannelMask  # noqa: F401
        for audiofile in audiofiles:
            if not isinstance(audiofile, FlacAudio):
                return False
        return True

    @classmethod
    def add_replay_gain(cls, filenames, progress=None):
        """adds ReplayGain valus to a list of filename strings"""
        from ..dispatch import open_files
        from ..replaygain import calculate_replay_gain_values

        tracks = [t for t in open_files(filenames)
                  if isinstance(t, cls)]
        if len(tracks) == 0:
            return

        for (track, gain, peak, album_gain, album_peak) in \
                calculate_replay_gain_values(tracks, progress):
            metadata = track.get_metadata()
            try:
                vorbis = metadata.get_block(Flac_VORBISCOMMENT.BLOCK_ID)
            except IndexError:
                from .. import VERSION
                vorbis = Flac_VORBISCOMMENT(
                    [], "tpu-audio-tools %s" % (VERSION,))
                metadata.add_block(vorbis)
            vorbis["REPLAYGAIN_TRACK_GAIN"] = ["%1.2f dB" % (gain,)]
            vorbis["REPLAYGAIN_TRACK_PEAK"] = ["%1.8f" % (peak,)]
            vorbis["REPLAYGAIN_ALBUM_GAIN"] = ["%1.2f dB" % (album_gain,)]
            vorbis["REPLAYGAIN_ALBUM_PEAK"] = ["%1.8f" % (album_peak,)]
            vorbis["REPLAYGAIN_REFERENCE_LOUDNESS"] = ["89.0 dB"]
            track.update_metadata(metadata)

    def replay_gain(self):
        """returns a ReplayGain object of our ReplayGain values or None"""
        from ..audiofile import ReplayGain as RG
        try:
            metadata = self.get_metadata()
            vorbis = metadata.get_block(Flac_VORBISCOMMENT.BLOCK_ID)
            return RG(
                vorbis["REPLAYGAIN_TRACK_GAIN"][0].split(" ")[0],
                vorbis["REPLAYGAIN_TRACK_PEAK"][0],
                vorbis["REPLAYGAIN_ALBUM_GAIN"][0].split(" ")[0],
                vorbis["REPLAYGAIN_ALBUM_PEAK"][0])
        except (IndexError, KeyError, ValueError, IOError):
            return None

    # ---- foreign WAV/AIFF chunk passthrough ---------------------------
    # each container chunk is stored as one APPLICATION block with
    # application id b"riff"/b"aiff" (reference flac.py:1890-2420):
    # the RIFF/FORM prologue is the first block, the "data"/"SSND"
    # chunk header (SSND keeps its 8 offset/blocksize bytes) marks
    # where the footer begins on reassembly

    def __foreign_blocks__(self, application_id):
        metadata = self.get_metadata()
        if metadata is None:
            return []
        return [b for b in
                metadata.get_blocks(Flac_APPLICATION.BLOCK_ID)
                if b.application_id == application_id]

    def has_foreign_wave_chunks(self):
        return len(self.__foreign_blocks__(b"riff")) > 0

    def has_foreign_aiff_chunks(self):
        return len(self.__foreign_blocks__(b"aiff")) > 0

    def __header_footer__(self, application_id, data_chunk_id):
        blocks = self.__foreign_blocks__(application_id)
        if not blocks:
            raise ValueError("no foreign %s chunks" %
                             (application_id.decode("ascii"),))
        data_bytes = (self.total_frames() * self.channels() *
                      (self.bits_per_sample() // 8))
        header = []
        footer = [b"\x00"] if (data_bytes % 2) else []
        current = header
        for block in blocks:
            current.append(block.data)
            if block.data[0:4] == data_chunk_id:
                current = footer
        return (b"".join(header), b"".join(footer))

    def wave_header_footer(self):
        """returns (header, footer) bytes reassembled from the
        stored foreign RIFF chunks"""
        return self.__header_footer__(b"riff", b"data")

    def aiff_header_footer(self):
        """returns (header, footer) bytes reassembled from the
        stored foreign AIFF chunks"""
        return self.__header_footer__(b"aiff", b"SSND")

    @classmethod
    def __chunks_to_blocks__(cls, application_id, header, footer,
                             big_endian, fmt_id, data_id,
                             data_header_extra):
        """splits container header/footer bytes into APPLICATION
        blocks; returns (blocks, data_chunk_size, total_size)"""
        from ..bitstream import BitstreamReader
        from .. import EncodingError
        import io as io_mod
        import struct as struct_mod

        end = ">" if big_endian else "<"
        blocks = []
        pos = 0
        if len(header) < 12:
            raise EncodingError("container header too short")
        (magic, remaining, form) = struct_mod.unpack(
            end + "4sI4s", header[0:12])
        blocks.append(Flac_APPLICATION(application_id, header[0:12]))
        total_size = remaining + 8
        pos = 12

        fmt_found = False
        data_chunk_size = None
        while pos < len(header):
            if pos + 8 > len(header):
                raise EncodingError("truncated container chunk")
            (chunk_id, chunk_size) = struct_mod.unpack(
                end + "4sI", header[pos:pos + 8])
            if not all(0x20 <= b <= 0x7E for b in chunk_id):
                raise EncodingError("invalid container chunk ID")
            if chunk_id == data_id:
                extra = header[pos + 8:pos + 8 + data_header_extra]
                if len(extra) != data_header_extra or \
                        pos + 8 + data_header_extra != len(header):
                    raise EncodingError(
                        "unexpected data after the PCM chunk header")
                if not fmt_found:
                    raise EncodingError("no format chunk in header")
                blocks.append(Flac_APPLICATION(
                    application_id, header[pos:pos + 8] + extra))
                data_chunk_size = chunk_size - data_header_extra
                pos = len(header)
                break
            padded = chunk_size + (chunk_size % 2)
            chunk = header[pos:pos + 8 + padded]
            if len(chunk) != 8 + padded:
                raise EncodingError("truncated container chunk")
            if chunk_id == fmt_id:
                if fmt_found:
                    raise EncodingError("multiple format chunks")
                fmt_found = True
            blocks.append(Flac_APPLICATION(application_id, chunk))
            pos += 8 + padded
        if data_chunk_size is None:
            raise EncodingError("no PCM data chunk in header")

        fpos = data_chunk_size % 2      # skip the data pad byte
        while fpos < len(footer):
            if fpos + 8 > len(footer):
                raise EncodingError("truncated container footer")
            (chunk_id, chunk_size) = struct_mod.unpack(
                end + "4sI", footer[fpos:fpos + 8])
            if not all(0x20 <= b <= 0x7E for b in chunk_id):
                raise EncodingError("invalid container chunk ID")
            if chunk_id in (fmt_id, data_id):
                raise EncodingError("duplicate %s chunk in footer" %
                                    (chunk_id.decode("ascii"),))
            padded = chunk_size + (chunk_size % 2)
            chunk = footer[fpos:fpos + 8 + padded]
            if len(chunk) != 8 + padded:
                raise EncodingError("truncated container footer")
            blocks.append(Flac_APPLICATION(application_id, chunk))
            fpos += 8 + padded
        return (blocks, data_chunk_size, total_size)

    @classmethod
    def __from_container__(cls, filename, header, pcmreader, footer,
                           compression, application_id, big_endian,
                           fmt_id, data_id, data_header_extra):
        from .. import EncodingError
        from ..pcmstream import CounterPCMReader

        (blocks, data_chunk_size,
         total_size) = cls.__chunks_to_blocks__(
            application_id, header, footer, big_endian, fmt_id,
            data_id, data_header_extra)

        counter = CounterPCMReader(pcmreader)
        flac = cls.from_pcm(filename, counter, compression)
        data_written = counter.bytes_written()
        if data_written != data_chunk_size:
            cls.__unlink__(filename)
            raise EncodingError("PCM data size differs from the "
                                "container's data chunk")
        # header + PCM + footer (footer carries any pad byte)
        # must reassemble the original container exactly
        if len(header) + data_written + len(footer) != total_size:
            cls.__unlink__(filename)
            raise EncodingError("container size mismatch")

        metadata = flac.get_metadata()
        if metadata is not None:
            for block in blocks:
                metadata.add_block(block)
            flac.update_metadata(metadata)
        return flac

    @classmethod
    def from_wave(cls, filename, header, pcmreader, footer,
                  compression=None):
        """encodes a new FLAC from wave data, preserving foreign
        RIFF chunks as APPLICATION metadata blocks"""
        return cls.__from_container__(
            filename, header, pcmreader, footer, compression,
            b"riff", False, b"fmt ", b"data", 0)

    @classmethod
    def from_aiff(cls, filename, header, pcmreader, footer,
                  compression=None):
        """encodes a new FLAC from AIFF data, preserving foreign
        AIFF chunks as APPLICATION metadata blocks"""
        return cls.__from_container__(
            filename, header, pcmreader, footer, compression,
            b"aiff", True, b"COMM", b"SSND", 8)

    def convert(self, target_path, target_class, compression=None,
                progress=None):
        """converts, routing stored foreign WAV/AIFF chunks to
        targets that accept them (reference flac.py:2385)"""
        from .. import EncodingError
        from ..pcmstream import to_pcm_progress

        if (self.has_foreign_wave_chunks() and
                hasattr(target_class, "from_wave") and
                callable(target_class.from_wave)):
            try:
                (header, footer) = self.wave_header_footer()
            except (ValueError, IOError) as err:
                raise EncodingError(str(err))
            return target_class.from_wave(
                target_path, header,
                to_pcm_progress(self, progress), footer, compression)
        if (self.has_foreign_aiff_chunks() and
                hasattr(target_class, "from_aiff") and
                callable(target_class.from_aiff)):
            try:
                (header, footer) = self.aiff_header_footer()
            except (ValueError, IOError) as err:
                raise EncodingError(str(err))
            return target_class.from_aiff(
                target_path, header,
                to_pcm_progress(self, progress), footer, compression)
        return target_class.from_pcm(
            target_path, to_pcm_progress(self, progress), compression,
            total_pcm_frames=self.total_frames())


def seektable_from_offsets(offsets, seekpoint_interval):
    """builds a Flac_SEEKTABLE from encoder (byte_offset, pcm_frames)
    pairs at the given PCM-frame interval
    (reference flac.py:1820-1835 semantics)"""
    seekpoints = []
    current_pcm_frame = 0
    next_seekpoint = 0
    for (byte_offset, pcm_frames) in offsets:
        if current_pcm_frame >= next_seekpoint:
            seekpoints.append(
                (current_pcm_frame, byte_offset, pcm_frames))
            next_seekpoint += seekpoint_interval
        current_pcm_frame += pcm_frames
    return Flac_SEEKTABLE(seekpoints)


class OggFlacDecoder:
    """a PCMReader decoding FLAC frames from Ogg packets"""

    def __init__(self, filename):
        from ..ogg import PageReader, PacketReader
        from .. import _native

        self.file = open(filename, "rb")
        self.packets = PacketReader(PageReader(self.file))
        header = self.packets.read_packet()
        if (len(header) < 51 or header[0] != 0x7F or
                header[1:5] != b"FLAC"):
            raise ValueError("invalid Ogg FLAC header packet")
        self.__header_packets__ = (header[7] << 8) | header[8]
        reader = BitstreamReader(header[13:], False)
        reader.parse("1u 7u 24u")
        streaminfo = Flac_STREAMINFO.parse(reader)
        for _ in range(self.__header_packets__):
            self.packets.read_packet()

        self.sample_rate = streaminfo.sample_rate
        self.channels = streaminfo.channels
        self.bits_per_sample = streaminfo.bits_per_sample
        self.channel_mask = int(ChannelMask(
            {1: 0x0004, 2: 0x0003, 3: 0x0007, 4: 0x0033,
             5: 0x0037, 6: 0x003F}.get(streaminfo.channels, 0)))
        self.__remaining__ = streaminfo.total_samples
        self.__native__ = _native
        self.__buffer__ = b""
        self.__eos__ = False

    def read(self, pcm_frames):
        from .. import pcm as pcm_mod
        if self.__remaining__ <= 0:
            return pcm_mod.empty_framelist(self.channels,
                                           self.bits_per_sample)
        want = max(pcm_frames, 4096)
        # top up the raw frame buffer from Ogg packets
        while not self.__eos__ and len(self.__buffer__) < (1 << 20):
            try:
                self.__buffer__ += self.packets.read_packet()
            except (IOError, ValueError):
                self.__eos__ = True
        (samples, consumed) = self.__native__.flac_decode(
            self.__buffer__, self.bits_per_sample, self.channels,
            min(want, self.__remaining__))
        self.__buffer__ = self.__buffer__[consumed:]
        if samples.shape[0] == 0 and self.__remaining__ > 0:
            if self.__eos__:
                raise IOError("truncated Ogg FLAC stream")
        self.__remaining__ -= samples.shape[0]
        import numpy as np
        return pcm_mod.FrameList._wrap(np.ascontiguousarray(samples),
                                       self.bits_per_sample)

    def close(self):
        self.file.close()


class OggFlacAudio(FlacAudio):
    """a Free Lossless Audio Codec file inside an Ogg container
    (reference flac.py:3038; mapping per the Ogg FLAC spec: first
    packet 0x7F "FLAC" 1.0 + header count + STREAMINFO, further
    header packets carry metadata blocks, audio packets carry one
    FLAC frame each with cumulative granule positions)"""

    SUFFIX = "oga"
    NAME = "oggflac"
    DESCRIPTION = "Ogg FLAC"

    @classmethod
    def available(cls, system_binaries=None):
        return True

    @classmethod
    def supports_cuesheet(cls):
        return True

    def __init__(self, filename):
        from ..ogg import PageReader, PacketReader
        AudioFile.__init__(self, filename)
        try:
            with open(filename, "rb") as f:
                packets = PacketReader(PageReader(f))
                header = packets.read_packet()
                if (len(header) < 51 or header[0] != 0x7F or
                        header[1:5] != b"FLAC"):
                    raise InvalidFLAC("invalid Ogg FLAC header")
                self.__header_packets__ = ((header[7] << 8) |
                                           header[8])
                reader = BitstreamReader(header[13:], False)
                reader.parse("1u 7u 24u")
                self.__streaminfo__ = Flac_STREAMINFO.parse(reader)
                self.__stream_offset__ = 0
        except (IOError, ValueError) as err:
            raise InvalidFLAC(str(err))

    def get_metadata(self):
        """returns a FlacMetaData object of all header blocks"""
        from ..ogg import PageReader, PacketReader
        with open(self.filename, "rb") as f:
            packets = PacketReader(PageReader(f))
            header = packets.read_packet()
            blocks = [self.__streaminfo__]
            for _ in range(self.__header_packets__):
                packet = packets.read_packet()
                reader = BitstreamReader(packet, False)
                (_last, block_type, block_length) = \
                    reader.parse("1u 7u 24u")
                blocks.append(_parse_block(reader, block_type,
                                           block_length))
            return FlacMetaData(blocks)

    def update_metadata(self, metadata):
        """writes the FlacMetaData to this file, rewriting it"""
        from ..ogg import (PageReader, PageWriter, PacketReader,
                           packet_to_pages)
        from ..utils.files import TemporaryFile
        from ..bitstream import BitstreamRecorder

        if not isinstance(metadata, FlacMetaData):
            raise ValueError("metadata must be FlacMetaData")

        # collect the audio pages from the current file
        with open(self.filename, "rb") as f:
            reader = PageReader(f)
            pages = []
            while True:
                try:
                    pages.append(reader.read())
                except (IOError, ValueError):
                    break
        serial = pages[0].bitstream_serial_number if pages else 0
        # count pages holding header packets: walk packets again
        with open(self.filename, "rb") as f:
            packets = PacketReader(PageReader(f))
            packets.read_packet()
            for _ in range(self.__header_packets__):
                packets.read_packet()
            # audio packets start on the page after the last header
            # packet's page (header packets are page-aligned in every
            # stream this class writes)
            last_header_page = packets.page.sequence_number
            first_audio_index = [p.sequence_number
                                 for p in pages].index(
                                     last_header_page) + 1

        new_file = TemporaryFile(self.filename)
        writer = PageWriter(new_file)
        seq = _write_oggflac_headers(writer, metadata, serial)
        for page in pages[first_audio_index:]:
            page.sequence_number = seq
            seq += 1
            writer.write(page)
        new_file.close()
        self.__header_packets__ = 1 + len(
            [b for b in metadata.blocks()
             if b.BLOCK_ID != Flac_STREAMINFO.BLOCK_ID])

    def set_metadata(self, metadata):
        """takes a MetaData object and sets this track's metadata"""
        metadata = FlacMetaData.converted(metadata)
        if metadata is None:
            return
        old_metadata = self.get_metadata()
        # preserve STREAMINFO
        metadata.replace_blocks(
            Flac_STREAMINFO.BLOCK_ID,
            old_metadata.get_blocks(Flac_STREAMINFO.BLOCK_ID))
        self.update_metadata(metadata)

    def delete_metadata(self):
        self.set_metadata(MetaData())

    def to_pcm(self):
        try:
            return OggFlacDecoder(self.filename)
        except (IOError, ValueError) as err:
            from ..pcmstream import PCMReaderError
            return PCMReaderError(
                str(err), self.sample_rate(), self.channels(),
                int(self.channel_mask()), self.bits_per_sample())

    @classmethod
    def from_pcm(cls, filename, pcmreader, compression=None,
                 total_pcm_frames=None, encoding_function=None):
        """encodes a new file from PCM data"""
        import io as io_mod
        from ..ogg import PageWriter, packet_to_pages
        from ..codecs.flac import encode_flac

        if ((compression is None) or
                (compression not in cls.COMPRESSION_MODES)):
            compression = cls.DEFAULT_COMPRESSION

        # encode a raw FLAC stream in memory, tracking frame offsets
        raw = io_mod.BytesIO()
        try:
            offsets = (encoding_function or encode_flac)(
                raw, pcmreader, padding_size=None,
                **FlacAudio.COMPRESSION_OPTIONS[compression])
        except (IOError, ValueError) as err:
            raise EncodingError(str(err))
        raw.seek(0, 0)

        # split metadata from frames
        flac_data = raw.getvalue()
        reader = BitstreamReader(io_mod.BytesIO(flac_data), False)
        if reader.read_bytes(4) != b"fLaC":
            raise EncodingError("no FLAC stream generated")
        metadata = FlacMetaData.parse(reader)
        frames_offset = 4
        r2 = BitstreamReader(io_mod.BytesIO(flac_data[4:]), False)
        last = 0
        while last != 1:
            (last, _btype, blen) = r2.parse("1u 7u 24u")
            r2.skip_bytes(blen)
            frames_offset += 4 + blen

        serial = 0x464C4143
        try:
            output = open(filename, "wb")
        except IOError as err:
            raise EncodingError(str(err))
        try:
            writer = PageWriter(output)
            seq = _write_oggflac_headers(writer, metadata, serial)

            # audio packets: one FLAC frame per packet
            granule = 0
            pending_pages = []
            for (i, (byte_offset, pcm_frames)) in enumerate(offsets):
                start = frames_offset + byte_offset
                if i + 1 < len(offsets):
                    end = frames_offset + offsets[i + 1][0]
                else:
                    end = len(flac_data)
                granule += pcm_frames
                for page in packet_to_pages(
                        flac_data[start:end], serial, seq):
                    page.granule_position = granule
                    pending_pages.append(page)
                    seq += 1
            if pending_pages:
                pending_pages[-1].stream_end = True
            else:
                # zero-length stream: single empty end page
                from ..ogg import Page
                pending_pages = [Page(False, False, True, 0, serial,
                                      seq, [])]
            for page in pending_pages:
                writer.write(page)
        finally:
            output.close()
        return cls(filename)

    def verify(self, progress=None):
        """decode-verifies the stream, returning True on success"""
        from ..pcmstream import to_pcm_progress
        decoder = self.to_pcm()
        try:
            framelist = decoder.read(65536)
            while framelist.frames > 0:
                framelist = decoder.read(65536)
        except (IOError, ValueError) as err:
            raise InvalidFLAC(str(err))
        finally:
            decoder.close()
        return True

    def seekable(self):
        return False


def _parse_block(reader, block_type, block_length):
    """parses one FLAC metadata block body by type"""
    if block_type == 0:
        return Flac_STREAMINFO.parse(reader)
    elif block_type == 1:
        return Flac_PADDING.parse(reader, block_length)
    elif block_type == 2:
        return Flac_APPLICATION.parse(reader, block_length)
    elif block_type == 3:
        return Flac_SEEKTABLE.parse(reader, block_length // 18)
    elif block_type == 4:
        return Flac_VORBISCOMMENT.parse(reader)
    elif block_type == 5:
        return Flac_CUESHEET.parse(reader)
    elif block_type == 6:
        return Flac_PICTURE.parse(reader)
    else:
        raise InvalidFLAC("unsupported metadata block type")


def _write_oggflac_headers(writer, metadata, serial):
    """writes the Ogg FLAC header packets; returns next sequence no.

    first packet: 0x7F "FLAC" 1.0 + header packet count + "fLaC" +
    STREAMINFO block (reference flac.py:2974-3035)"""
    from ..ogg import packet_to_pages
    from ..bitstream import BitstreamRecorder

    streaminfo = metadata.get_block(Flac_STREAMINFO.BLOCK_ID)
    valid_blocks = [b for b in metadata.blocks()
                    if ((b.BLOCK_ID != Flac_STREAMINFO.BLOCK_ID) and
                        (b.size() < (1 << 24)))]

    rec = BitstreamRecorder(False)
    rec.write(8, 0x7F)
    rec.write_bytes(b"FLAC")
    rec.write(8, 1)
    rec.write(8, 0)
    rec.write(16, len(valid_blocks))
    rec.write_bytes(b"fLaC")
    rec.write(1, 0)
    rec.write(7, 0)
    rec.write(24, streaminfo.size())
    streaminfo.build(rec)

    pages = list(packet_to_pages(rec.data(), serial, 0))
    pages[0].stream_beginning = True
    for page in pages:
        writer.write(page)
    seq = len(pages)

    for (i, block) in enumerate(valid_blocks, 1):
        rec = BitstreamRecorder(False)
        rec.write(1, 0 if i != len(valid_blocks) else 1)
        rec.write(7, block.BLOCK_ID)
        rec.write(24, block.size())
        block.build(rec)
        for page in packet_to_pages(rec.data(), serial, seq):
            writer.write(page)
            seq += 1
    return seq
