"""User-visible text constants.

Rebuild of the reference ``/root/reference/audiotools/text.py``: every
user-facing string lives here as a constant so the CLI layer stays
translatable (the reference wraps these with gettext; this build keeps
the indirection point with plain strings and a ``gettext`` hook that
is a no-op unless translations are installed)."""

from __future__ import annotations

try:
    import gettext as _gettext_mod
    _ = _gettext_mod.translation("audiotools_tpu",
                                 fallback=True).gettext
except Exception:                           # pragma: no cover
    def _(s):
        return s


# ---- generic errors ------------------------------------------------------
ERR_1_FILE_REQUIRED = _("you must specify at least 1 supported "
                        "audio file")
ERR_FILE_NOT_FOUND = _("file or directory not found")
ERR_UNSUPPORTED_TYPE = _("unsupported audio type %(type)r")
ERR_UNSUPPORTED_COMPRESSION = _("\"%(quality)s\" is not a supported "
                                "compression mode for type "
                                "\"%(type)s\"")
ERR_DUPLICATE_FILE = _("file %(filename)s included more than once")
ERR_OPEN_IOERROR = _("unable to open %(filename)s")
ERR_ENCODING_ERROR = _("unable to write %(filename)s")
ERR_INVALID_FILENAME_FORMAT = _("invalid filename format string")

# ---- metadata ------------------------------------------------------------
ERR_ID3_INVALID_HEADER = _("invalid ID3 header")
ERR_ID3_INVALID_VERSION = _("invalid ID3 major version")
ERR_APE_INVALID_HEADER = _("invalid ApeTag header")
ERR_VORBIS_INVALID_COMMENT = _("invalid Vorbis comment")
ERR_IMAGE_UNKNOWN_TYPE = _("unknown image type")

# ---- formats ---------------------------------------------------------------
ERR_FLAC_INVALID_FILE = _("invalid FLAC file")
ERR_FLAC_MD5_MISMATCH = _("MD5 mismatch at end of stream")
ERR_OGG_INVALID_PAGE = _("invalid Ogg page marker")
ERR_OGG_CHECKSUM_MISMATCH = _("Ogg page checksum mismatch")
ERR_WAV_INVALID_FILE = _("invalid RIFF WAVE file")
ERR_AIFF_INVALID_FILE = _("invalid AIFF file")
ERR_MP3_INVALID_FRAME = _("invalid MPEG frame header")
ERR_TTA_INVALID_SIGNATURE = _("invalid TTA signature")
ERR_TTA_INVALID_CRC = _("invalid CRC32 in frame")
ERR_WAVPACK_INVALID_BLOCK = _("invalid WavPack block")
ERR_SHN_INVALID_MAGIC = _("invalid Shorten magic number")
ERR_ALAC_INVALID_ATOM = _("required atom not found")

# ---- CD / disc -------------------------------------------------------------
ERR_NO_CDDA = _("physical CD-ROM devices are not supported in this "
                "build; use a cue/toc disc image")
ERR_TRACK_NOT_FOUND = _("track %(track)d not found on disc")
LAB_TRACK_PROGRESS = _("track %(track)d")
LAB_RIPPED_TRACK = _("ripped track %(track)d")

# ---- players ----------------------------------------------------------------
LAB_PLAYING = _("playing %(filename)s")
LAB_STOPPED = _("stopped")
ERR_NO_OUTPUT = _("no available audio output")

# ---- lint / undo -------------------------------------------------------------
ERR_UNDO_REQUIRES_DB = _("--undo requires --db")
LAB_RESTORED = _("* %(filename)s: restored")
LAB_NO_BACKUP = _("* %(filename)s: no stored backup")
LAB_FIXED = _("* %(filename)s: fixed")

# ---- cover art ----------------------------------------------------------------
ERR_NO_IMAGES = _("no images found in %(filename)s")
LAB_DUMPED_IMAGE = _("dumped %(output)s")
