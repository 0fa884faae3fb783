"""Format dispatch: open() / file_type() content sniffing and TYPE_MAP.

Rebuild of the reference dispatch layer
(``/root/reference/audiotools/__init__.py``): file_type (:1353, magic-byte
sniffing per container), open (:1489), Filename (:1553), sorted_tracks
(:1620), open_files (:1691), open_directory (:1767), group_tracks (:1786),
AVAILABLE_TYPES / TYPE_MAP construction (:5636-5653).
"""

from __future__ import annotations

import os

from .audiofile import MetaData  # noqa: F401


class DuplicateFile(Exception):
    """raised if the same file is included more than once"""

    def __init__(self, filename):
        self.filename = filename

    def __str__(self):
        return "file \"%s\" included more than once" % (self.filename,)


class DuplicateOutputFile(Exception):
    """raised if the same output file is generated more than once"""

    def __init__(self, filename):
        self.filename = filename

    def __str__(self):
        return "output file \"%s\" occurs more than once" % (self.filename,)


class OutputFileIsInput(Exception):
    """raised if an output file is the same as an input file"""

    def __init__(self, filename):
        self.filename = filename

    def __str__(self):
        return "\"%s\" cannot be both input and output file" % \
            (self.filename,)


class Filename(tuple):
    """a filename wrapper which dedups by device/inode when on disk"""

    def __new__(cls, filename):
        filename = str(filename)
        try:
            stat = os.stat(filename)
            return tuple.__new__(cls, [os.path.normpath(filename),
                                       stat.st_dev,
                                       stat.st_ino])
        except OSError:
            return tuple.__new__(cls, [os.path.normpath(filename),
                                       None,
                                       None])

    def disk_file(self):
        """returns True if the file exists on disk"""
        return (self[1] is not None) and (self[2] is not None)

    def basename(self):
        """returns the basename (no directory) of this file"""
        return Filename(os.path.basename(self[0]))

    def expanduser(self):
        """returns a Filename object with user directory expanded"""
        return Filename(os.path.expanduser(self[0]))

    def __repr__(self):
        return "Filename(%s, %s, %s)" % \
            (repr(self[0]), repr(self[1]), repr(self[2]))

    def __eq__(self, filename):
        if isinstance(filename, Filename):
            if self.disk_file() and filename.disk_file():
                return (self[1] == filename[1]) and (self[2] == filename[2])
            elif (not self.disk_file()) and (not filename.disk_file()):
                return self[0] == filename[0]
            else:
                return False
        else:
            return False

    def __ne__(self, filename):
        return not self == filename

    def __hash__(self):
        if self.disk_file():
            return hash((None, self[1], self[2]))
        else:
            return hash((self[0], self[1], self[2]))

    def __str__(self):
        return self[0]



def _fmt(module, name):
    """imports a format class, returning None if unimplemented"""
    import importlib
    try:
        return getattr(importlib.import_module(module, __package__), name)
    except (ImportError, AttributeError):
        return None


def file_type(file):
    """given a seekable binary file stream, returns an
    AudioFile-compatible class or None if unknown

    magic-byte checks per container, mirroring reference
    __init__.py:1353-1487"""

    start = file.tell()
    header = file.read(37)
    file.seek(start, 0)

    if (header[4:8] == b"ftyp") and (header[8:12] in (b'mp41',
                                                      b'mp42',
                                                      b'M4A ',
                                                      b'M4B ')):
        # possibly ALAC or M4A; examine the stsd sample description atom
        from .bitstream import BitstreamReader
        try:
            from .formats.m4a import get_m4a_atom, ALACAudio, M4AAudio
        except ImportError:
            return None
        reader = BitstreamReader(file, False)
        try:
            stsd = get_m4a_atom(reader,
                                b"moov", b"trak", b"mdia",
                                b"minf", b"stbl", b"stsd")[1]
            (stsd_version, descriptions,
             atom_size, atom_type) = stsd.parse("8u 24p 32u 32u 4b")
            if atom_type == b"alac":
                return ALACAudio
            elif atom_type == b"mp4a":
                return M4AAudio
            else:
                return None
        except (KeyError, IOError):
            return None
        finally:
            file.seek(start, 0)
    elif (header[0:4] == b"FORM") and (header[8:12] == b"AIFF"):
        return _fmt(".formats.aiff", "AiffAudio")
    elif header[0:4] == b".snd":
        return _fmt(".formats.au", "AuAudio")
    elif header[0:4] == b"fLaC":
        return _fmt(".formats.flac", "FlacAudio")
    elif (len(header) >= 4) and (header[0] == 0xFF):
        # possibly MP3 or MP2: MPEG-1 layer III/II frame header
        frame_sync = (header[0] << 3) | (header[1] >> 5)
        mpeg_id = (header[1] >> 3) & 0x3
        layer_description = (header[1] >> 1) & 0x3
        bitrate = (header[2] >> 4) & 0xF
        sample_rate = (header[2] >> 2) & 0x3
        emphasis = header[3] & 0x3
        if ((frame_sync == 0x7FF) and
                (mpeg_id == 3) and
                (layer_description == 1) and
                (bitrate != 0xF) and
                (sample_rate != 3) and
                (emphasis != 2)):
            return _fmt(".formats.mp3", "MP3Audio")
        elif ((frame_sync == 0x7FF) and
                (mpeg_id == 3) and
                (layer_description == 2) and
                (bitrate != 0xF) and
                (sample_rate != 3) and
                (emphasis != 2)):
            return _fmt(".formats.mp3", "MP2Audio")
        else:
            return None
    elif header[0:4] == b"OggS":
        # possibly Ogg FLAC, Ogg Vorbis or Ogg Opus
        if header[0x1C:0x21] == b"\x7FFLAC":
            return _fmt(".formats.flac", "OggFlacAudio")
        elif header[0x1C:0x23] == b"\x01vorbis":
            return _fmt(".formats.vorbis", "VorbisAudio")
        elif header[0x1C:0x26] == b"OpusHead\x01":
            return _fmt(".formats.opus", "OpusAudio")
        else:
            return None
    elif header[0:4] == b"MAC ":
        return _fmt(".meta.ape", "ApeAudio")
    elif header[0:5] == b"ajkg\x02":
        return _fmt(".formats.shn", "ShortenAudio")
    elif header[0:4] == b"wvpk":
        return _fmt(".formats.wavpack", "WavPackAudio")
    elif (header[0:4] == b"RIFF") and (header[8:12] == b"WAVE"):
        return _fmt(".formats.wav", "WaveAudio")
    elif ((len(header) >= 10) and
          (header[0:3] == b"ID3") and
          (header[3] in (2, 3, 4))):
        # file contains an ID3v2 tag; skip it and re-check
        tag_size = 0
        for b in header[6:10]:
            tag_size = (tag_size << 7) | (b & 0x7F)
        file.seek(start + 10 + tag_size, 0)
        t = file_type(file)
        file.seek(start, 0)
        # only return types which might be wrapped in ID3v2 tags
        id3_wrappable = tuple(
            c for c in (_fmt(".formats.flac", "FlacAudio"),
                        _fmt(".formats.tta", "TrueAudio"),
                        _fmt(".formats.mp3", "MP3Audio"),
                        _fmt(".formats.mp3", "MP2Audio"))
            if c is not None)
        if (t is None) or (t in id3_wrappable):
            return t
        else:
            return None
    elif header[0:4] == b"TTA1":
        return _fmt(".formats.tta", "TrueAudio")
    else:
        return None


_builtin_open = __import__("builtins").open


def open(filename):
    """returns an AudioFile located at the given filename path

    raises UnsupportedFile if the type is unknown,
    InvalidFile if the file has errors,
    IOError if the file cannot be opened at all"""
    from . import UnsupportedFile

    with _builtin_open(filename, "rb") as f:
        audio_class = file_type(f)
    if (audio_class is not None) and audio_class.available():
        return audio_class(filename)
    else:
        raise UnsupportedFile(filename)


def sorted_tracks(audiofiles):
    """returns AudioFile objects sorted by album/track number"""

    def sort_key(pair):
        (track, metadata) = pair
        basename = os.path.basename(track.filename)
        if metadata is not None:
            album_number = metadata.album_number
            track_number = metadata.track_number
            return (1,
                    album_number is not None,
                    album_number if album_number is not None else 0,
                    track_number is not None,
                    track_number if track_number is not None else 0,
                    basename if track_number is None else "")
        else:
            return (0, False, 0, False, 0, basename)

    tracks = [(f, f.get_metadata()) for f in audiofiles]
    tracks.sort(key=sort_key)
    return [t[0] for t in tracks]


def open_files(filename_list, sorted=True, messenger=None,
               no_duplicates=False, warn_duplicates=False,
               opened_files=None, unsupported_formats=None):
    """returns a list of AudioFile objects from filename strings"""
    from . import InvalidFile

    if opened_files is None:
        opened_files = set()
    if unsupported_formats is None:
        unsupported_formats = set()

    to_return = []

    for filename in map(Filename, filename_list):
        if filename in opened_files:
            if no_duplicates:
                raise DuplicateFile(filename)
            elif warn_duplicates and (messenger is not None):
                messenger.warning(
                    "file \"%s\" included more than once" % (filename,))
        else:
            opened_files.add(filename)

        try:
            with _builtin_open(str(filename), "rb") as f:
                audio_class = file_type(f)
            if audio_class is not None:
                if audio_class.available():
                    to_return.append(audio_class(str(filename)))
                elif ((messenger is not None) and
                      (audio_class.NAME not in unsupported_formats)):
                    audio_class.missing_components(messenger)
                    unsupported_formats.add(audio_class.NAME)
        except IOError:
            if messenger is not None:
                messenger.warning(
                    "unable to open \"%s\"" % (filename,))
        except InvalidFile as err:
            if messenger is not None:
                messenger.error(str(err))

    return (sorted_tracks(to_return) if sorted else to_return)


def open_directory(directory, sorted=True, messenger=None):
    """yields AudioFile objects via a recursive directory search"""
    for (basedir, subdirs, filenames) in os.walk(directory):
        if sorted:
            subdirs.sort()
            filenames.sort()
        for audiofile in open_files([os.path.join(basedir, filename)
                                     for filename in filenames],
                                    sorted=sorted,
                                    messenger=messenger):
            yield audiofile


def group_tracks(tracks):
    """yields lists of tracks grouped by album name/number"""
    collection = {}
    for track in tracks:
        metadata = track.get_metadata()
        if metadata is not None:
            key = (metadata.album_number, metadata.album_name)
        else:
            key = (None, None)
        collection.setdefault(key, []).append(track)
    for key in sorted(collection.keys(),
                      key=lambda k: ((k[0] is not None, k[0] or 0),
                                     (k[1] is not None, k[1] or ""))):
        yield collection[key]


def _available_types():
    """imports all format classes, returning those that load"""
    classes = []
    import importlib
    for (module, names) in [
            (".formats.wav", ["WaveAudio"]),
            (".formats.aiff", ["AiffAudio"]),
            (".formats.au", ["AuAudio"]),
            (".formats.flac", ["FlacAudio", "OggFlacAudio"]),
            (".formats.shn", ["ShortenAudio"]),
            (".formats.tta", ["TrueAudio"]),
            (".formats.wavpack", ["WavPackAudio"]),
            (".formats.m4a", ["ALACAudio", "M4AAudio"]),
            (".formats.mp3", ["MP3Audio", "MP2Audio"]),
            (".formats.vorbis", ["VorbisAudio"]),
            (".formats.opus", ["OpusAudio"]),
    ]:
        try:
            mod = importlib.import_module(module, __package__)
            for name in names:
                cls = getattr(mod, name, None)
                if cls is not None:
                    classes.append(cls)
        except ImportError:
            continue
    return tuple(classes)


AVAILABLE_TYPES = _available_types()

TYPE_MAP = {track_type.NAME: track_type
            for track_type in AVAILABLE_TYPES
            if track_type.available()}

DEFAULT_TYPE = "flac"


class UnknownAudioType(Exception):
    """raised by filename_to_type for an unrecognized suffix
    (reference __init__.py:1815)"""

    def __init__(self, suffix):
        Exception.__init__(self, "unknown audio type %r" % (suffix,))
        self.suffix = suffix

    def error_msg(self, messenger):
        from .text import ERR_UNSUPPORTED_AUDIO_TYPE
        messenger.error(ERR_UNSUPPORTED_AUDIO_TYPE %
                        {"type": self.suffix})


class AmbiguousAudioType(UnknownAudioType):
    """raised by filename_to_type when a suffix maps to several
    audio types (reference __init__.py:1823)"""

    def __init__(self, suffix, type_list):
        Exception.__init__(
            self, "ambiguous audio type %r" % (suffix,))
        self.suffix = suffix
        self.type_list = type_list


def filename_to_type(path):
    """returns the AudioFile class matching the path's suffix
    (reference __init__.py:1834); raises UnknownAudioType or
    AmbiguousAudioType"""
    import os as os_mod

    (_base, ext) = os_mod.path.splitext(path)
    if len(ext) > 0:
        ext = ext[1:]
        suffix_map = {}
        for audio_type in TYPE_MAP.values():
            suffix_map.setdefault(audio_type.SUFFIX, []).append(
                audio_type)
        if ext in suffix_map:
            if len(suffix_map[ext]) == 1:
                return suffix_map[ext][0]
            raise AmbiguousAudioType(ext, suffix_map[ext])
    raise UnknownAudioType(ext)
