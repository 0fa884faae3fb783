"""M4A container support: ALAC and (binary-gated) AAC audio.

Rebuild of the reference M4A layer (``/root/reference/audiotools/m4a.py``):
get_m4a_atom navigation (used by content sniffing), ALACAudio with the
full atom-tree construction around the ALAC mdat (m4a.py:975-1084:
ftyp/moov/mvhd/trak/tkhd/mdia/mdhd/hdlr/minf/smhd/dinf/stbl/stsd(alac)/
stts/stsc/stsz/stco/udta/meta), metadata updates with stco offset
adjustment, and M4AAudio whose AAC support runs through external
binaries exactly like the reference (subprocess faac/faad, gated by
availability).
"""

from __future__ import annotations

from .. import text

import struct
import time

from .. import (EncodingError, InvalidFile, UnsupportedBitsPerSample,
                UnsupportedChannelMask)
from ..audiofile import AudioFile
from ..pcmstream import ChannelMask, PCMReaderError
from ..meta.m4a_atoms import (M4A_META_Atom, M4A_Tree_Atom,
                              M4A_Leaf_Atom, parse_atoms)


class InvalidALAC(InvalidFile):
    pass


class InvalidM4A(InvalidFile):
    pass


def get_m4a_atom(reader, *atoms):
    """finds the given nested atom path in a BitstreamReader

    returns (atom_size, atom_reader) of the final atom's payload
    or raises KeyError if the atom cannot be found"""
    for (i, next_atom) in enumerate(atoms):
        last = (i == len(atoms) - 1)
        try:
            (length, stream_atom) = reader.parse("32u 4b")
            while stream_atom != next_atom:
                if length < 8:
                    raise KeyError(next_atom)
                reader.skip_bytes(length - 8)
                (length, stream_atom) = reader.parse("32u 4b")
            if last:
                return (length - 8, reader.substream(length - 8))
            else:
                reader = reader.substream(length - 8)
        except IOError:
            raise KeyError(next_atom)


def get_m4a_atom_offset(reader, *atoms):
    """returns (offset, size) of the given atom (incl. header)"""
    offset = 0
    for (i, next_atom) in enumerate(atoms):
        last = (i == len(atoms) - 1)
        try:
            (length, stream_atom) = reader.parse("32u 4b")
            while stream_atom != next_atom:
                if length < 8:
                    raise KeyError(next_atom)
                reader.skip_bytes(length - 8)
                offset += length
                (length, stream_atom) = reader.parse("32u 4b")
            if last:
                return (offset, length)
            else:
                offset += 8
                reader = reader.substream(length - 8)
        except IOError:
            raise KeyError(next_atom)


class ALACAudio(AudioFile):
    """an Apple Lossless audio file"""

    SUFFIX = "m4a"
    NAME = "alac"
    DESCRIPTION = "Apple Lossless"
    DEFAULT_COMPRESSION = ""
    COMPRESSION_MODES = ("",)
    COMPRESSION_DESCRIPTIONS = {"": text.COMP_ALAC}
    BINARIES = tuple()

    BLOCK_SIZE = 4096
    INITIAL_HISTORY = 10
    HISTORY_MULTIPLIER = 40
    MAXIMUM_K = 14

    def __init__(self, filename):
        AudioFile.__init__(self, filename)
        from ..bitstream import BitstreamReader
        from ..ref.alac import ALACDecoder

        try:
            decoder = ALACDecoder(open(filename, "rb"))
        except (IOError, ValueError, KeyError) as err:
            raise InvalidALAC(str(err))
        self.__channels__ = decoder.channels
        self.__bits_per_sample__ = decoder.bits_per_sample
        self.__sample_rate__ = decoder.sample_rate
        self.__total_pcm_frames__ = decoder.total_pcm_frames
        self.__channel_mask__ = decoder.channel_mask
        decoder.close()

    def lossless(self):
        return True

    def bits_per_sample(self):
        return self.__bits_per_sample__

    def channels(self):
        return self.__channels__

    def channel_mask(self):
        return ChannelMask(self.__channel_mask__)

    def sample_rate(self):
        return self.__sample_rate__

    def total_frames(self):
        return self.__total_pcm_frames__

    def seekable(self):
        return True

    def to_pcm(self):
        from ..codecs.alac import decoder_for_file
        try:
            return decoder_for_file(open(self.filename, "rb"))
        except (IOError, ValueError, KeyError) as err:
            return PCMReaderError(str(err),
                                  self.__sample_rate__,
                                  self.__channels__,
                                  self.__channel_mask__,
                                  self.__bits_per_sample__)

    @classmethod
    def from_pcm(cls, filename, pcmreader,
                 compression=None, total_pcm_frames=None,
                 block_size=4096, encoding_function=None):
        """encodes a new file from PCM data"""
        from ..codecs.alac import encode_mdat

        if pcmreader.bits_per_sample not in (16, 24):
            raise UnsupportedBitsPerSample(filename,
                                           pcmreader.bits_per_sample)
        if int(pcmreader.channel_mask) not in \
                (0x0001, 0x0004, 0x0003, 0x0007, 0x0107, 0x0037,
                 0x003F, 0x013F, 0x00FF, 0x0000):
            raise UnsupportedChannelMask(filename,
                                         int(pcmreader.channel_mask))

        if encoding_function is None:
            encoding_function = encode_mdat

        import tempfile
        create_date = int(time.time()) + 2082844800

        try:
            mdat_file = tempfile.TemporaryFile()
            (frame_byte_sizes, actual_pcm_frames) = encoding_function(
                mdat_file, pcmreader,
                block_size=block_size,
                initial_history=cls.INITIAL_HISTORY,
                history_multiplier=cls.HISTORY_MULTIPLIER,
                maximum_k=cls.MAXIMUM_K)
            if ((total_pcm_frames is not None) and
                    (actual_pcm_frames != total_pcm_frames)):
                raise EncodingError("total PCM frames mismatch")

            mdat_size = 8 + sum(frame_byte_sizes)

            ftyp = cls.__ftyp_atom__()
            # compute moov size with a placeholder offset first
            moov = cls.__moov_atom__(pcmreader, create_date, 0,
                                     mdat_size, block_size,
                                     actual_pcm_frames,
                                     frame_byte_sizes)
            pre_mdat_size = len(ftyp) + 8 + moov.size()
            moov = cls.__moov_atom__(pcmreader, create_date,
                                     pre_mdat_size, mdat_size,
                                     block_size, actual_pcm_frames,
                                     frame_byte_sizes)

            with open(filename, "wb") as f:
                f.write(ftyp)
                f.write(moov.build())
                mdat_file.seek(0, 0)
                while True:
                    chunk = mdat_file.read(0x100000)
                    if not chunk:
                        break
                    f.write(chunk)
            mdat_file.close()
            return cls(filename)
        except (IOError, ValueError) as err:
            cls.__unlink__(filename)
            raise EncodingError(str(err))
        finally:
            try:
                pcmreader.close()
            except Exception:
                pass

    # ---- atom builders ------------------------------------------------
    @classmethod
    def __ftyp_atom__(cls):
        payload = (b"M4A \x00\x00\x00\x00" +
                   b"M4A mp42isom" + b"\x00" * 4)
        return struct.pack(">I", len(payload) + 8) + b"ftyp" + payload

    @classmethod
    def __moov_atom__(cls, pcmreader, create_date, mdat_offset,
                      mdat_size, block_size, total_pcm_frames,
                      frame_byte_sizes):
        return M4A_Tree_Atom(b"moov", [
            cls.__mvhd_atom__(pcmreader, create_date,
                              total_pcm_frames),
            M4A_Tree_Atom(b"trak", [
                cls.__tkhd_atom__(create_date, total_pcm_frames),
                M4A_Tree_Atom(b"mdia", [
                    cls.__mdhd_atom__(pcmreader, create_date,
                                      total_pcm_frames),
                    cls.__hdlr_atom__(),
                    M4A_Tree_Atom(b"minf", [
                        cls.__smhd_atom__(),
                        M4A_Tree_Atom(b"dinf", [cls.__dref_atom__()]),
                        M4A_Tree_Atom(b"stbl", [
                            cls.__stsd_atom__(pcmreader, mdat_size,
                                              block_size,
                                              total_pcm_frames,
                                              frame_byte_sizes),
                            cls.__stts_atom__(total_pcm_frames,
                                              block_size),
                            cls.__stsc_atom__(total_pcm_frames,
                                              block_size),
                            cls.__stsz_atom__(frame_byte_sizes),
                            cls.__stco_atom__(mdat_offset,
                                              frame_byte_sizes),
                        ])])])]),
            M4A_Tree_Atom(b"udta", [cls.__meta_atom__()])])

    @classmethod
    def __mvhd_atom__(cls, pcmreader, create_date, total_pcm_frames):
        data = struct.pack(
            ">BxxxIIIIIH", 0, create_date, create_date,
            pcmreader.sample_rate, total_pcm_frames, 0x10000, 0x100)
        data += b"\x00" * 10
        data += struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                            0x40000000)
        data += struct.pack(">6I", 0, 0, 0, 0, 0, 0)
        data += struct.pack(">I", 2)
        return M4A_Leaf_Atom(b"mvhd", data)

    @classmethod
    def __tkhd_atom__(cls, create_date, total_pcm_frames):
        data = struct.pack(">B3BIIIxxxxI", 0, 0, 0, 7,
                           create_date, create_date, 1,
                           total_pcm_frames)
        data += b"\x00" * 8
        data += struct.pack(">HHHxx", 0, 0, 0x100)
        data += struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                            0x40000000)
        data += struct.pack(">II", 0, 0)
        return M4A_Leaf_Atom(b"tkhd", data)

    @classmethod
    def __mdhd_atom__(cls, pcmreader, create_date, total_pcm_frames):
        language = 0
        for c in "und":
            language = (language << 5) | (ord(c) - 0x60)
        data = struct.pack(">BxxxIIIIHH", 0, create_date, create_date,
                           pcmreader.sample_rate, total_pcm_frames,
                           language, 0)
        return M4A_Leaf_Atom(b"mdhd", data)

    @classmethod
    def __hdlr_atom__(cls):
        data = (b"\x00" * 4 + b"\x00" * 4 + b"soun" + b"\x00" * 4 +
                b"\x00" * 8 + b"\x00")
        return M4A_Leaf_Atom(b"hdlr", data)

    @classmethod
    def __smhd_atom__(cls):
        return M4A_Leaf_Atom(b"smhd", b"\x00" * 8)

    @classmethod
    def __dref_atom__(cls):
        url = struct.pack(">I", 12) + b"url " + b"\x00\x00\x00\x01"
        return M4A_Leaf_Atom(b"dref",
                             struct.pack(">BxxxI", 0, 1) + url)

    @classmethod
    def __stsd_atom__(cls, pcmreader, mdat_size, block_size,
                      total_pcm_frames, frame_byte_sizes):
        sub_alac = struct.pack(
            ">IxBBBBBHIII",
            block_size,
            pcmreader.bits_per_sample,
            cls.HISTORY_MULTIPLIER,
            cls.INITIAL_HISTORY,
            cls.MAXIMUM_K,
            pcmreader.channels,
            0x00FF,
            max(frame_byte_sizes) if frame_byte_sizes else 0,
            ((mdat_size * 8 * pcmreader.sample_rate) //
             total_pcm_frames) if total_pcm_frames else 0,
            pcmreader.sample_rate)
        sub_alac_atom = (struct.pack(">I", len(sub_alac) + 12) +
                         b"alac" + b"\x00" * 4 + sub_alac)
        alac = (b"\x00" * 6 +                    # reserved
                struct.pack(">H", 1) +           # data ref index
                struct.pack(">HH", 0, 0) +       # version/revision
                b"\x00" * 4 +                    # vendor
                struct.pack(">HH",
                            pcmreader.channels,
                            pcmreader.bits_per_sample) +
                struct.pack(">HH", 0, 0) +       # compression/packet
                struct.pack(">I", 0xAC440000) +  # fixed sample rate
                sub_alac_atom)
        alac_atom = struct.pack(">I", len(alac) + 8) + b"alac" + alac
        data = struct.pack(">BxxxI", 0, 1) + alac_atom
        return M4A_Leaf_Atom(b"stsd", data)

    @classmethod
    def __stts_atom__(cls, total_pcm_frames, block_size):
        times = [(total_pcm_frames // block_size, block_size),
                 (1, total_pcm_frames % block_size)]
        times = [t for t in times if (t[0] > 0 and t[1] > 0)]
        data = struct.pack(">BxxxI", 0, len(times))
        for (count, duration) in times:
            data += struct.pack(">II", count, duration)
        return M4A_Leaf_Atom(b"stts", data)

    @classmethod
    def __stsc_atom__(cls, total_pcm_frames, block_size):
        alac_frames = ((total_pcm_frames // block_size) +
                       (1 if (total_pcm_frames % block_size) else 0))
        per_chunk = 5
        if alac_frames < per_chunk:
            blocks = [(1, alac_frames, 1)]
        else:
            blocks = [(1, per_chunk, 1)]
            if alac_frames % per_chunk:
                blocks.append((1 + (alac_frames // per_chunk),
                               alac_frames % per_chunk, 1))
        data = struct.pack(">BxxxI", 0, len(blocks))
        for (first, count, desc) in blocks:
            data += struct.pack(">III", first, count, desc)
        return M4A_Leaf_Atom(b"stsc", data)

    @classmethod
    def __stsz_atom__(cls, frame_byte_sizes):
        data = struct.pack(">BxxxII", 0, 0, len(frame_byte_sizes))
        for size in frame_byte_sizes:
            data += struct.pack(">I", size)
        return M4A_Leaf_Atom(b"stsz", data)

    @classmethod
    def __stco_atom__(cls, mdat_offset, frame_byte_sizes):
        per_chunk = 5
        sizes = list(frame_byte_sizes)
        chunk_offsets = [mdat_offset + 8]
        while len(sizes) > 0:
            chunk_offsets.append(chunk_offsets[-1] +
                                 sum(sizes[0:per_chunk]))
            sizes = sizes[per_chunk:]
        chunk_offsets = chunk_offsets[:-1]
        data = struct.pack(">BxxxI", 0, len(chunk_offsets))
        for offset in chunk_offsets:
            data += struct.pack(">I", offset)
        return M4A_Leaf_Atom(b"stco", data)

    @classmethod
    def __meta_atom__(cls):
        from .. import VERSION
        from ..meta.m4a_atoms import ilst_string_atom
        return M4A_META_Atom(0, 0, [
            M4A_Leaf_Atom(b"hdlr",
                          b"\x00" * 8 + b"mdir" + b"appl" +
                          b"\x00" * 9),
            M4A_Tree_Atom(b"ilst", [
                ilst_string_atom(b"\xa9too",
                                 "tpu-audio-tools %s" % (VERSION,))]),
            M4A_Leaf_Atom(b"free", b"\x00" * 1024)])

    # ---- metadata ------------------------------------------------------
    def get_metadata(self):
        """returns an M4A_META_Atom object, or None"""
        with open(self.filename, "rb") as f:
            data = f.read()
        atoms = parse_atoms(data)
        for atom in atoms:
            if atom.name == b"moov":
                try:
                    udta = atom.get_child(b"udta")
                    meta = udta.get_child(b"meta")
                    if isinstance(meta, M4A_META_Atom):
                        return meta
                except KeyError:
                    return None
        return None

    def update_metadata(self, metadata):
        """writes an M4A_META_Atom back, adjusting stco offsets"""
        if metadata is None:
            raise ValueError("metadata not from audio file")
        if not isinstance(metadata, M4A_META_Atom):
            raise ValueError("metadata not from audio file")

        with open(self.filename, "rb") as f:
            data = f.read()
        atoms = parse_atoms(data)

        moov = None
        for atom in atoms:
            if atom.name == b"moov":
                moov = atom
        if moov is None:
            raise ValueError("moov atom not found")

        old_size = moov.size()
        # replace udta/meta
        try:
            udta = moov.get_child(b"udta")
            udta.replace_child(metadata)
        except KeyError:
            moov.add_child(M4A_Tree_Atom(b"udta", [metadata]))

        size_delta = moov.size() - old_size

        if size_delta != 0:
            # adjust stco chunk offsets if mdat follows moov
            try:
                stbl = (moov.get_child(b"trak").get_child(b"mdia")
                        .get_child(b"minf").get_child(b"stbl"))
                stco = stbl.get_child(b"stco")
                (count,) = struct.unpack(">I", stco.data[4:8])
                offsets = list(struct.unpack(
                    ">%dI" % (count,), stco.data[8:8 + 4 * count]))
                # find mdat position relative to moov in the file
                mdat_pos = moov_pos = None
                pos = 0
                for atom in atoms:
                    if atom.name == b"mdat":
                        mdat_pos = pos
                    if atom.name == b"moov":
                        moov_pos = pos
                    pos += 8 + atom.size()
                if (mdat_pos is not None and moov_pos is not None and
                        mdat_pos > moov_pos):
                    offsets = [o + size_delta for o in offsets]
                    stco.data = (stco.data[0:4] +
                                 struct.pack(">I", count) +
                                 struct.pack(">%dI" % (count,),
                                             *offsets))
            except KeyError:
                pass

        from ..utils.files import TemporaryFile
        new_file = TemporaryFile(self.filename)
        for atom in atoms:
            new_file.write(atom.build())
        new_file.close()

    def set_metadata(self, metadata):
        """converts and sets this track's metadata"""
        if metadata is None:
            return
        self.update_metadata(M4A_META_Atom.converted(metadata))

    def delete_metadata(self):
        self.update_metadata(self.__meta_atom__())


class M4AAudio(AudioFile):
    """an AAC audio file in an M4A container

    like the reference (m4a.py:277-703), AAC encode/decode runs
    through external binaries chosen at runtime; without them the
    format is detected but unavailable"""

    SUFFIX = "m4a"
    NAME = "m4a"
    DESCRIPTION = "Advanced Audio Coding"
    DEFAULT_COMPRESSION = "100"
    COMPRESSION_MODES = tuple(map(str, range(10, 101, 5)))
    BINARIES = ("faac", "faad")
    BINARY_URLS = {"faac": "http://www.audiocoding.com/",
                   "faad": "http://www.audiocoding.com/"}

    def __init__(self, filename):
        AudioFile.__init__(self, filename)
        from ..bitstream import BitstreamReader

        try:
            with open(filename, "rb") as f:
                mp4a = get_m4a_atom(BitstreamReader(f, False),
                                    b"moov", b"trak", b"mdia", b"minf",
                                    b"stbl", b"stsd")[1]
                (_version, _descriptions, _size, _name,
                 self.__channels__,
                 self.__bits_per_sample__,
                 self.__sample_rate__) = mp4a.parse(
                     "8u 24p 32u 32u 4b 6P 16p 16p 16p 4P "
                     "16u 16u 16p 16p 32u")
                self.__sample_rate__ >>= 16
            with open(filename, "rb") as f:
                mdhd = get_m4a_atom(BitstreamReader(f, False),
                                    b"moov", b"trak", b"mdia",
                                    b"mdhd")[1]
                (version,) = mdhd.parse("8u 24p")
                if version == 0:
                    (self.__length__,) = mdhd.parse(
                        "32p 32p 32p 32u 2P 16p")
                else:
                    (self.__length__,) = mdhd.parse(
                        "64p 64p 32p 64U 2P 16p")
        except (IOError, KeyError) as err:
            raise InvalidM4A(str(err))

    def lossless(self):
        return False

    def bits_per_sample(self):
        return self.__bits_per_sample__

    def channels(self):
        return self.__channels__

    def sample_rate(self):
        return self.__sample_rate__

    def total_frames(self):
        return self.__length__

    def to_pcm(self):
        """decodes via the faad binary, as the reference does"""
        import subprocess
        from ..pcmstream import PCMReader
        from ..utils.config import BIN

        if not self.available():
            return PCMReaderError("faad binary not available",
                                  self.__sample_rate__,
                                  self.__channels__, 0,
                                  self.__bits_per_sample__)
        process = subprocess.Popen(
            [BIN["faad"], "-f", "2", "-w", self.filename],
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL)
        return PCMReader(process.stdout,
                         self.__sample_rate__,
                         self.__channels__,
                         0,
                         self.__bits_per_sample__,
                         process=process)

    @classmethod
    def from_pcm(cls, filename, pcmreader,
                 compression=None, total_pcm_frames=None):
        """encodes via the faac binary, as the reference does"""
        import subprocess
        from ..pcmstream import transfer_framelist_data
        from ..utils.config import BIN, default_quality

        if not cls.available():
            raise EncodingError("faac binary not available")

        if (compression is None) or (compression not in
                                     cls.COMPRESSION_MODES):
            compression = default_quality(cls.NAME) or \
                cls.DEFAULT_COMPRESSION

        process = subprocess.Popen(
            [BIN["faac"], "-q", compression, "-P",
             "-R", str(pcmreader.sample_rate),
             "-B", str(pcmreader.bits_per_sample),
             "-C", str(pcmreader.channels),
             "-X", "-o", filename, "-"],
            stdin=subprocess.PIPE, stderr=subprocess.DEVNULL)
        transfer_framelist_data(pcmreader, process.stdin.write)
        process.stdin.close()
        if process.wait() != 0:
            cls.__unlink__(filename)
            raise EncodingError("error encoding file with faac")
        return cls(filename)
