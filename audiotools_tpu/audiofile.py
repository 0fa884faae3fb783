"""AudioFile abstract base class, MetaData, Image, and Sheet objects.

API-parity rebuild of the reference core classes
(``/root/reference/audiotools/__init__.py``): MetaData (:2944, 18 fields),
AlbumMetaData (:3356), Image (:3392), ReplayGain (:3522), AudioFile
(:3595), WaveContainer (:4075), AiffContainer (:4148), DummyAudioFile
(:4221), Sheet/SheetTrack/SheetIndex (:4286/4363/4422).
"""

from __future__ import annotations

from . import text

import os

from .pcmstream import (ChannelMask, FRAMELIST_SIZE, pcm_frame_cmp,
                        to_pcm_progress, transfer_data)


class MetaData:
    """the base class for storing textual AudioFile metadata

    fields may be None, indicating they're not present in the
    underlying metadata implementation
    """

    FIELDS = ("track_name",
              "track_number",
              "track_total",
              "album_name",
              "artist_name",
              "performer_name",
              "composer_name",
              "conductor_name",
              "media",
              "ISRC",
              "catalog",
              "copyright",
              "publisher",
              "year",
              "date",
              "album_number",
              "album_total",
              "comment")

    INTEGER_FIELDS = ("track_number",
                      "track_total",
                      "album_number",
                      "album_total")

    # presentation order for user-facing display
    FIELD_ORDER = ("track_name",
                   "artist_name",
                   "album_name",
                   "track_number",
                   "track_total",
                   "album_number",
                   "album_total",
                   "performer_name",
                   "composer_name",
                   "conductor_name",
                   "catalog",
                   "ISRC",
                   "publisher",
                   "media",
                   "year",
                   "date",
                   "copyright",
                   "comment")

    FIELD_NAMES = {"track_name": text.METADATA_TRACK_NAME,
                   "track_number": text.METADATA_TRACK_NUMBER,
                   "track_total": text.METADATA_TRACK_TOTAL,
                   "album_name": text.METADATA_ALBUM_NAME,
                   "artist_name": text.METADATA_ARTIST_NAME,
                   "performer_name": text.METADATA_PERFORMER_NAME,
                   "composer_name": text.METADATA_COMPOSER_NAME,
                   "conductor_name": text.METADATA_CONDUCTOR_NAME,
                   "media": text.METADATA_MEDIA,
                   "ISRC": text.METADATA_ISRC,
                   "catalog": text.METADATA_CATALOG,
                   "copyright": text.METADATA_COPYRIGHT,
                   "publisher": text.METADATA_PUBLISHER,
                   "year": text.METADATA_YEAR,
                   "date": text.METADATA_DATE,
                   "album_number": text.METADATA_ALBUM_NUMBER,
                   "album_total": text.METADATA_ALBUM_TOTAL,
                   "comment": text.METADATA_COMMENT}

    def __init__(self,
                 track_name=None,
                 track_number=None,
                 track_total=None,
                 album_name=None,
                 artist_name=None,
                 performer_name=None,
                 composer_name=None,
                 conductor_name=None,
                 media=None,
                 ISRC=None,
                 catalog=None,
                 copyright=None,
                 publisher=None,
                 year=None,
                 date=None,
                 album_number=None,
                 album_total=None,
                 comment=None,
                 images=None):
        # bypass __setattr__ which subclasses may redefine
        d = self.__dict__
        d['track_name'] = track_name
        d['track_number'] = track_number
        d['track_total'] = track_total
        d['album_name'] = album_name
        d['artist_name'] = artist_name
        d['performer_name'] = performer_name
        d['composer_name'] = composer_name
        d['conductor_name'] = conductor_name
        d['media'] = media
        d['ISRC'] = ISRC
        d['catalog'] = catalog
        d['copyright'] = copyright
        d['publisher'] = publisher
        d['year'] = year
        d['date'] = date
        d['album_number'] = album_number
        d['album_total'] = album_total
        d['comment'] = comment
        d['__images__'] = list(images) if images is not None else []

    def __repr__(self):
        return "MetaData(%s)" % ",".join(
            ["%s=%s" % (field, repr(getattr(self, field)))
             for field in MetaData.FIELDS])

    def __delattr__(self, field):
        if field in self.FIELDS:
            self.__dict__[field] = None
        else:
            try:
                del self.__dict__[field]
            except KeyError:
                raise AttributeError(field)

    def fields(self):
        """yields an (attr, value) tuple per MetaData field"""
        for attr in self.FIELDS:
            yield (attr, getattr(self, attr))

    def filled_fields(self):
        """yields an (attr, value) tuple per non-blank MetaData field"""
        for (attr, field) in self.fields():
            if field is not None:
                yield (attr, field)

    def empty_fields(self):
        """yields an (attr, value) tuple per blank MetaData field"""
        for (attr, field) in self.fields():
            if field is None:
                yield (attr, field)

    def __str__(self):
        lines = []
        for attr in self.FIELD_ORDER:
            if attr in ("track_total", "album_total"):
                continue
            elif attr in ("track_number", "album_number"):
                number = getattr(self, attr)
                total = getattr(self, attr.replace("number", "total"))
                if (number is None) and (total is None):
                    continue
                elif total is None:
                    value = str(number)
                elif number is None:
                    value = "?/%d" % (total,)
                else:
                    value = "%d/%d" % (number, total)
                lines.append("%s : %s" % (self.FIELD_NAMES[attr], value))
            elif getattr(self, attr) is not None:
                lines.append("%s : %s" % (self.FIELD_NAMES[attr],
                                          getattr(self, attr)))
        for image in self.images():
            lines.append("Picture : %s" % (image,))
        return os.linesep.join(lines)

    def raw_info(self):
        """returns a string of low-level MetaData information"""
        raise NotImplementedError()

    def __eq__(self, metadata):
        for attr in MetaData.FIELDS:
            if ((not hasattr(metadata, attr)) or
                    (getattr(self, attr) != getattr(metadata, attr))):
                return False
        return True

    def __ne__(self, metadata):
        return not self.__eq__(metadata)

    @classmethod
    def converted(cls, metadata):
        """converts metadata from another class to this one, if necessary"""
        if metadata is not None:
            fields = {field: getattr(metadata, field)
                      for field in cls.FIELDS}
            fields["images"] = metadata.images()
            return MetaData(**fields)
        else:
            return None

    @classmethod
    def supports_images(cls):
        """returns True if this MetaData class supports embedded images"""
        return True

    def images(self):
        """returns a list of embedded Image objects"""
        return self.__images__[:]

    def front_covers(self):
        return [i for i in self.images() if i.type == FRONT_COVER]

    def back_covers(self):
        return [i for i in self.images() if i.type == BACK_COVER]

    def leaflet_pages(self):
        return [i for i in self.images() if i.type == LEAFLET_PAGE]

    def media_images(self):
        return [i for i in self.images() if i.type == MEDIA]

    def other_images(self):
        return [i for i in self.images() if i.type == OTHER]

    def add_image(self, image):
        """embeds an Image object in this metadata"""
        if self.supports_images():
            self.__images__.append(image)
        else:
            raise ValueError("this metadata type does not support images")

    def delete_image(self, image):
        """deletes an Image object from this metadata"""
        if self.supports_images():
            self.__images__.pop(self.__images__.index(image))
        else:
            raise ValueError("this metadata type does not support images")

    def clean(self):
        """returns a (MetaData, fixes_performed) tuple"""
        return (MetaData(**{field: getattr(self, field)
                            for field in MetaData.FIELDS}), [])

    def intersection(self, metadata):
        """returns a new MetaData object of fields shared with metadata"""
        return MetaData(**{field: getattr(self, field)
                           for field in MetaData.FIELDS
                           if (getattr(self, field) is not None and
                               getattr(self, field) ==
                               getattr(metadata, field, None))})


class AlbumMetaData(dict):
    """a container for several MetaData objects keyed by track number"""

    def __init__(self, metadata_iter):
        dict.__init__(self, {m.track_number: m for m in metadata_iter})

    def metadata(self):
        """returns a single MetaData object of all consistent fields"""
        return MetaData(**{field: list(items)[0]
                           for (field, items) in
                           [(field, {getattr(track, field)
                                     for track in self.values()})
                            for field in MetaData.FIELDS]
                           if len(items) == 1})


(FRONT_COVER, BACK_COVER, LEAFLET_PAGE, MEDIA, OTHER) = range(5)


class Image:
    """an image data container"""

    def __init__(self, data, mime_type, width, height,
                 color_depth, color_count, description, type):
        self.data = data
        self.mime_type = mime_type
        self.width = width
        self.height = height
        self.color_depth = color_depth
        self.color_count = color_count
        self.description = description
        self.type = type

    def suffix(self):
        """returns the image's recommended suffix as a plain string"""
        return {"image/jpeg": "jpg",
                "image/png": "png",
                "image/gif": "gif",
                "image/tiff": "tiff",
                "image/x-ms-bmp": "bmp"}.get(self.mime_type, "bin")

    def type_string(self):
        """returns the image's type as a human-readable plain string"""
        return {FRONT_COVER: "Front Cover",
                BACK_COVER: "Back Cover",
                LEAFLET_PAGE: "Leaflet Page",
                MEDIA: "Media",
                OTHER: "Other"}.get(self.type, "Other")

    def __repr__(self):
        return ("Image(mime_type=%s,width=%s,height=%s,type=%s,...)" %
                (repr(self.mime_type), repr(self.width),
                 repr(self.height), repr(self.type)))

    def __str__(self):
        return "%s (%d×%d,'%s')" % (self.type_string(),
                                         self.width, self.height,
                                         self.mime_type)

    @classmethod
    def new(cls, image_data, description, type):
        """builds an Image from raw data, parsing its metrics"""
        from .meta.image import image_metrics
        img = image_metrics(image_data)
        return Image(data=image_data,
                     mime_type=img.mime_type,
                     width=img.width,
                     height=img.height,
                     color_depth=img.bits_per_pixel,
                     color_count=img.color_count,
                     description=description,
                     type=type)

    def __eq__(self, image):
        if image is not None:
            for attr in ["data", "mime_type", "width", "height",
                         "color_depth", "color_count", "description",
                         "type"]:
                if ((not hasattr(image, attr)) or
                        (getattr(self, attr) != getattr(image, attr))):
                    return False
            return True
        else:
            return False

    def __ne__(self, image):
        return not self.__eq__(image)


class ReplayGain:
    """a container for ReplayGain gain/peak values"""

    def __init__(self, track_gain, track_peak, album_gain, album_peak):
        self.track_gain = float(track_gain)
        self.track_peak = float(track_peak)
        self.album_gain = float(album_gain)
        self.album_peak = float(album_peak)

    def __repr__(self):
        return "ReplayGain(%s, %s, %s, %s)" % \
            (self.track_gain, self.track_peak,
             self.album_gain, self.album_peak)

    def __eq__(self, rg):
        for attr in ["track_gain", "track_peak", "album_gain", "album_peak"]:
            if ((not hasattr(rg, attr)) or
                    (getattr(self, attr) != getattr(rg, attr))):
                return False
        return True

    def __ne__(self, rg):
        return not self.__eq__(rg)


class AudioFile:
    """an abstract class representing audio files on disk"""

    SUFFIX = ""
    NAME = ""
    DESCRIPTION = ""
    DEFAULT_COMPRESSION = ""
    COMPRESSION_MODES = ("",)
    COMPRESSION_DESCRIPTIONS = {}
    BINARIES = tuple()
    BINARY_URLS = {}
    REPLAYGAIN_BINARIES = tuple()

    def __init__(self, filename):
        """raises InvalidFile or subclass if the file is invalid"""
        self.filename = filename

    def bits_per_sample(self):
        """returns an integer number of bits-per-sample"""
        raise NotImplementedError()

    def channels(self):
        """returns an integer number of channels"""
        raise NotImplementedError()

    def channel_mask(self):
        """returns a ChannelMask object of this track's channel layout"""
        return ChannelMask.from_channels(self.channels())

    def lossless(self):
        """returns True if this track's data is stored losslessly"""
        raise NotImplementedError()

    def update_metadata(self, metadata):
        """sets this track's metadata from its own get_metadata() object"""
        if metadata is not None:
            raise NotImplementedError()
        else:
            raise ValueError("metadata not from audio file")

    def set_metadata(self, metadata):
        """takes a MetaData object and sets this track's metadata"""
        pass

    def get_metadata(self):
        """returns a MetaData object, or None"""
        return None

    def delete_metadata(self):
        """deletes the track's MetaData"""
        pass

    def total_frames(self):
        """returns the total PCM frames of the track as an integer"""
        raise NotImplementedError()

    def cd_frames(self):
        """returns the total length of the track in CD frames (1/75th s)"""
        try:
            return (self.total_frames() * 75) // self.sample_rate()
        except ZeroDivisionError:
            return 0

    def seconds_length(self):
        """returns the length of the track as a Decimal number of seconds"""
        import decimal
        try:
            return (decimal.Decimal(self.total_frames()) /
                    decimal.Decimal(self.sample_rate()))
        except decimal.DivisionByZero:
            return decimal.Decimal(0)

    def sample_rate(self):
        """returns the rate of the track's audio as an integer Hz"""
        raise NotImplementedError()

    def seekable(self):
        """returns True if the file is seekable"""
        return False

    def to_pcm(self):
        """returns a PCMReader object containing the track's PCM data"""
        raise NotImplementedError()

    @classmethod
    def from_pcm(cls, filename, pcmreader,
                 compression=None, total_pcm_frames=None):
        """encodes a new file from PCM data, returning an AudioFile"""
        raise NotImplementedError()

    def convert(self, target_path, target_class,
                compression=None, progress=None):
        """encodes a new AudioFile from this AudioFile"""
        return target_class.from_pcm(
            target_path,
            to_pcm_progress(self, progress),
            compression,
            total_pcm_frames=(self.total_frames() if self.lossless()
                              else None))

    @classmethod
    def __unlink__(cls, filename):
        try:
            os.unlink(filename)
        except OSError:
            pass

    @classmethod
    def track_name(cls, file_path, track_metadata=None, format=None,
                   suffix=None):
        """constructs a new filename string from a format template"""
        from .utils.config import FILENAME_FORMAT

        if format is None:
            format = FILENAME_FORMAT
        if suffix is None:
            suffix = cls.SUFFIX
        try:
            if track_metadata is not None:
                track_number = track_metadata.track_number or 0
                album_number = track_metadata.album_number or 0
                track_total = track_metadata.track_total or 0
                album_total = track_metadata.album_total or 0
            else:
                track_number = album_number = track_total = album_total = 0

            format_dict = {"track_number": track_number,
                           "album_number": album_number,
                           "track_total": track_total,
                           "album_total": album_total,
                           "suffix": suffix}

            if album_number == 0:
                format_dict["album_track_number"] = "%2.2d" % (track_number,)
            else:
                album_digits = len(str(album_total))
                format_dict["album_track_number"] = (
                    ("%%%(album_digits)d.%(album_digits)dd%%2.2d" %
                     {"album_digits": album_digits}) %
                    (album_number, track_number))

            for field in MetaData.FIELDS:
                if field in MetaData.INTEGER_FIELDS:
                    continue
                value = (getattr(track_metadata, field)
                         if track_metadata is not None else None)
                if value is not None:
                    format_dict[field] = str(value).replace(
                        '/', '-').replace(chr(0), ' ')
                else:
                    format_dict[field] = ""

            format_dict["basename"] = os.path.splitext(
                os.path.basename(file_path))[0]

            return format % format_dict
        except KeyError as error:
            raise UnsupportedTracknameField(str(error.args[0]))
        except (TypeError, ValueError):
            raise InvalidFilenameFormat()

    @classmethod
    def supports_replay_gain(cls):
        """returns True if this class supports ReplayGain"""
        return False

    @classmethod
    def add_replay_gain(cls, filenames, progress=None):
        """adds ReplayGain values to a list of filename strings"""
        return

    @classmethod
    def can_add_replay_gain(cls, audiofiles):
        """returns True if this class can add ReplayGain to audiofiles"""
        return False

    @classmethod
    def lossless_replay_gain(cls):
        """returns True if applying ReplayGain is a lossless process"""
        return False

    def replay_gain(self):
        """returns a ReplayGain object of our ReplayGain values or None"""
        return None

    def set_cuesheet(self, cuesheet):
        """imports cuesheet data from a Sheet object"""
        pass

    def get_cuesheet(self):
        """returns the embedded Sheet-compatible object, or None"""
        return None

    def __eq__(self, audiofile):
        if hasattr(audiofile, "to_pcm") and callable(audiofile.to_pcm):
            p1 = p2 = None
            try:
                p1 = self.to_pcm()
                p2 = audiofile.to_pcm()
                return pcm_frame_cmp(p1, p2) is None
            except (ValueError, IOError):
                return False
            finally:
                for p in (p1, p2):
                    if p is not None:
                        try:
                            p.close()
                        except Exception:
                            pass
        else:
            return False

    def __ne__(self, audiofile):
        return not self.__eq__(audiofile)

    def verify(self, progress=None):
        """verifies the current file; returns True or raises InvalidFile"""
        from . import InvalidFile, DecodingError

        decoder = None
        try:
            total_frames = self.total_frames()
            decoder = self.to_pcm()
            pcm_frame_count = 0
            framelist = decoder.read(FRAMELIST_SIZE)
            while len(framelist) > 0:
                pcm_frame_count += framelist.frames
                if progress is not None:
                    progress(pcm_frame_count, total_frames)
                framelist = decoder.read(FRAMELIST_SIZE)
        except (IOError, ValueError) as err:
            raise InvalidFile(str(err))

        try:
            decoder.close()
        except DecodingError as err:
            raise InvalidFile(err.error_message)

        if self.lossless():
            if pcm_frame_count == total_frames:
                return True
            else:
                raise InvalidFile("incorrect PCM frame count")
        else:
            return True

    @classmethod
    def available(cls, system_binaries=None):
        """returns True if all necessary components are available"""
        if system_binaries is None:
            from .utils.config import BIN as system_binaries
        for command in cls.BINARIES:
            if not system_binaries.can_execute(system_binaries[command]):
                return False
        return True

    @classmethod
    def missing_components(cls, messenger):
        """displays binaries/libraries needed to support this format"""
        for b in cls.BINARIES:
            messenger.info(
                "program \"%s\" is required to support %s files" %
                (b, cls.NAME))
            if b in cls.BINARY_URLS:
                messenger.info("available from %s" % (cls.BINARY_URLS[b],))

    def clean(self, output_filename=None):
        """cleans the file of known data and metadata problems

        returns a list of fixes performed as strings"""
        if output_filename is None:
            metadata = self.get_metadata()
            if metadata is not None:
                (metadata, fixes) = metadata.clean()
                return fixes
            else:
                return []
        else:
            with open(self.filename, "rb") as input_f:
                with open(output_filename, "wb") as output_f:
                    transfer_data(input_f.read, output_f.write)

            from .dispatch import open as open_track
            new_track = open_track(output_filename)
            metadata = self.get_metadata()
            if metadata is not None:
                (metadata, fixes) = metadata.clean()
                new_track.set_metadata(metadata)
                return fixes
            else:
                return []


class UnsupportedTracknameField(Exception):
    """raised by AudioFile.track_name() for unsupported template fields"""

    def __init__(self, field):
        self.field = field

    def __str__(self):
        return "unknown field \"%s\" in file format" % (self.field,)


class InvalidFilenameFormat(Exception):
    """raised by AudioFile.track_name() for broken format strings"""

    def __str__(self):
        return "invalid filename format string"


class WaveContainer(AudioFile):
    """an AudioFile which may contain foreign RIFF chunks"""

    def has_foreign_wave_chunks(self):
        """returns True if the file has RIFF chunks other than
        'fmt ' and 'data' which must be preserved during conversion"""
        raise NotImplementedError()

    def wave_header_footer(self):
        """returns a (header, footer) bytes pair around the PCM data"""
        raise NotImplementedError()

    @classmethod
    def from_wave(cls, filename, header, pcmreader, footer,
                  compression=None):
        """encodes a new file from wave data with header/footer bytes"""
        raise NotImplementedError()

    def convert(self, target_path, target_class, compression=None,
                progress=None):
        from . import EncodingError
        if (self.has_foreign_wave_chunks() and
                hasattr(target_class, "from_wave") and
                callable(target_class.from_wave)):
            try:
                (header, footer) = self.wave_header_footer()
            except (ValueError, IOError) as err:
                raise EncodingError(str(err))
            return target_class.from_wave(target_path,
                                          header,
                                          to_pcm_progress(self, progress),
                                          footer,
                                          compression)
        else:
            return target_class.from_pcm(
                target_path,
                to_pcm_progress(self, progress),
                compression,
                total_pcm_frames=(self.total_frames() if self.lossless()
                                  else None))


class AiffContainer(AudioFile):
    """an AudioFile which may contain foreign AIFF chunks"""

    def has_foreign_aiff_chunks(self):
        """returns True if the file has AIFF chunks other than
        'COMM' and 'SSND' which must be preserved during conversion"""
        raise NotImplementedError()

    def aiff_header_footer(self):
        """returns a (header, footer) bytes pair around the PCM data"""
        raise NotImplementedError()

    @classmethod
    def from_aiff(cls, filename, header, pcmreader, footer,
                  compression=None):
        """encodes a new file from AIFF data with header/footer bytes"""
        raise NotImplementedError()

    def convert(self, target_path, target_class, compression=None,
                progress=None):
        from . import EncodingError
        if (self.has_foreign_aiff_chunks() and
                hasattr(target_class, "from_aiff") and
                callable(target_class.from_aiff)):
            try:
                (header, footer) = self.aiff_header_footer()
            except (ValueError, IOError) as err:
                raise EncodingError(str(err))
            return target_class.from_aiff(target_path,
                                          header,
                                          to_pcm_progress(self, progress),
                                          footer,
                                          compression)
        else:
            return target_class.from_pcm(
                target_path,
                to_pcm_progress(self, progress),
                compression,
                total_pcm_frames=(self.total_frames() if self.lossless()
                                  else None))


class DummyAudioFile(AudioFile):
    """a placeholder AudioFile object with external data"""

    def __init__(self, length, metadata):
        self.__length__ = length
        self.__metadata__ = metadata
        AudioFile.__init__(self, "")

    def get_metadata(self):
        return self.__metadata__

    def cd_frames(self):
        return self.__length__

    def sample_rate(self):
        return 44100

    def total_frames(self):
        return (self.cd_frames() * self.sample_rate()) // 75


class SheetException(ValueError):
    """a parent exception for CueException and TOCException"""


def read_sheet(filename):
    """returns a Sheet-compatible object from a .cue or .toc file"""
    from .sheets import toc, cue
    try:
        # try TOC first, since its CD_DA header makes it easier to spot
        return toc.read_tocfile(filename)
    except SheetException:
        return cue.read_cuesheet(filename)


class Sheet:
    """an object representing a CDDA layout (.cue or .toc)"""

    def __init__(self, sheet_tracks, catalog_number=None):
        self.__tracks__ = list(sheet_tracks)
        self.__catalog_number__ = catalog_number

    def __repr__(self):
        return "Sheet(%s, %s)" % (repr(self.__tracks__),
                                  repr(self.__catalog_number__))

    def __eq__(self, sheet):
        if not (hasattr(sheet, "catalog") and
                callable(sheet.catalog) and
                self.catalog() == sheet.catalog()):
            return False
        elif hasattr(sheet, "tracks") and callable(sheet.tracks):
            return list(self.tracks()) == list(sheet.tracks())
        else:
            return False

    def __len__(self):
        return len(self.__tracks__)

    def track(self, track_number):
        """returns the SheetTrack with the given number or raises KeyError"""
        for track in self.tracks():
            if track_number == track.number():
                return track
        raise KeyError(track_number)

    def tracks(self):
        return iter(self.__tracks__)

    def catalog(self):
        """returns the sheet's catalog number as a plain string, or None"""
        return self.__catalog_number__

    def image_formatted(self):
        """returns True if formatted for a CD image instead of tracks"""
        first_indexes = [min(i.offset() for i in t.indexes())
                         for t in self.tracks()]
        if len(first_indexes) > 1:
            for (prev, index) in zip(first_indexes, first_indexes[1:]):
                if index <= prev:
                    return False
            return True
        else:
            return True

    def pcm_lengths(self, total_pcm_frames, sample_rate):
        """yields per-track lengths in PCM frames"""
        if len(self.__tracks__) == 0:
            return
        for (prev, track) in zip(self.__tracks__, self.__tracks__[1:]):
            track_pcm_frames = int((track.index(1).offset() -
                                    prev.index(1).offset()) * sample_rate)
            total_pcm_frames -= track_pcm_frames
            yield track_pcm_frames
        yield total_pcm_frames


class SheetTrack:
    def __init__(self, number, indexes, audio=True, ISRC=None):
        self.__number__ = number
        self.__indexes__ = list(indexes)
        self.__audio__ = audio
        self.__ISRC__ = ISRC

    def __repr__(self):
        return "SheetTrack(%s, %s, %s, %s)" % (repr(self.__number__),
                                               repr(self.__indexes__),
                                               repr(self.__audio__),
                                               repr(self.__ISRC__))

    def __eq__(self, track):
        for method in ["number", "audio", "ISRC"]:
            if not (hasattr(track, method) and
                    callable(getattr(track, method)) and
                    getattr(self, method)() == getattr(track, method)()):
                return False
        if hasattr(track, "indexes") and callable(track.indexes):
            return list(self.indexes()) == list(track.indexes())
        else:
            return False

    def __len__(self):
        return len(self.__indexes__)

    def index(self, index_number):
        """returns the SheetIndex with the given number or raises KeyError"""
        for index in self.indexes():
            if index_number == index.number():
                return index
        raise KeyError(index_number)

    def indexes(self):
        return iter(self.__indexes__)

    def number(self):
        return self.__number__

    def ISRC(self):
        return self.__ISRC__

    def audio(self):
        return self.__audio__


class SheetIndex:
    def __init__(self, number, offset):
        """offset is seconds from stream start as a Fraction"""
        self.__number__ = number
        self.__offset__ = offset

    def __repr__(self):
        return "SheetIndex(%s, %s)" % (repr(self.__number__),
                                       repr(self.__offset__))

    def __eq__(self, index):
        for method in ["number", "offset"]:
            if not (hasattr(index, method) and
                    callable(getattr(index, method)) and
                    getattr(self, method)() == getattr(index, method)()):
                return False
        return True

    def number(self):
        return self.__number__

    def offset(self):
        return self.__offset__


def parse_timestamp(s):
    """parses a "M:S:F" or integer timestamp string into CD frames"""
    if ":" in s:
        (m, sec, f) = map(int, s.split(":"))
        return (m * 60 * 75) + (sec * 75) + f
    else:
        return int(s)


def build_timestamp(i):
    """returns a "M:S:F" timestamp string from CD frames"""
    return "%2.2d:%2.2d:%2.2d" % ((i // 75) // 60, (i // 75) % 60, i % 75)
