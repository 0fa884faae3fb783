"""User-visible text constants.

Rebuild of the reference ``/root/reference/audiotools/text.py`` (616
constants): every user-facing string — error messages, labels, CLI
option help — lives here as a constant so the tool layer stays
translatable.  The reference wraps these with gettext; this build
keeps the same indirection point with a ``gettext`` hook that is a
no-op unless translations are installed."""

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
ERR_FILES_REQUIRED = _("you must specify at least 1 supported "
                       "audio file;\nperhaps \"%(command)s\"")
ERR_FILE_NOT_FOUND = _("file or directory not found")
ERR_UNSUPPORTED_TYPE = _("unsupported audio type %(type)r")
ERR_UNSUPPORTED_AUDIO_TYPE = _("unsupported audio type \"%(type)s\"")
ERR_SUPPORTED_TYPES = _("supported types: %(types)s")
ERR_UNSUPPORTED_COMPRESSION = _("\"%(quality)s\" is not a supported "
                                "compression mode for type "
                                "\"%(type)s\"")
ERR_NO_COMPRESSION_MODES = _("audio type \"%(type)s\" has no "
                             "quality settings")
ERR_DUPLICATE_FILE = _("file %(filename)s included more than once")
ERR_OPEN_IOERROR = _("unable to open %(filename)s")
ERR_ENCODING_ERROR = _("unable to write %(filename)s")
ERR_DECODING_ERROR = _("unable to read %(filename)s")
ERR_INVALID_FILENAME_FORMAT = _("invalid filename format string")
ERR_OUTPUT_IS_INPUT = _("%(filename)s cannot be both input and "
                        "output file")
ERR_OUTPUT_DUPLICATE_NAME = _("output file occurs more than once; "
                              "use --format with distinguishing "
                              "fields")
ERR_OUTPUT_INVALID_FORMAT = _("unable to build output filenames "
                              "from format string")
ERR_ONE_OUTPUT_FILE = _("you may specify only 1 input file for use "
                        "with -o")
ERR_MAKEDIRS = _("unable to create directory for \"%(filename)s\": "
                 "%(error)s")
ERR_URWID_REQUIRED = _("urwid is required for interactive mode; "
                       "run without -I or install urwid")
ERR_TERMIOS_ERROR = _("unable to get tty settings (%(error)s)")
ERR_NO_STDIN_TTY = _("standard input is not a tty")

# ---- ui labels -----------------------------------------------------------
LAB_CANCEL_BUTTON = _("Cancel")
LAB_APPLY_BUTTON = _("Apply")
LAB_NEXT_BUTTON = _("Next")
LAB_PREVIOUS_BUTTON = _("Previous")
LAB_KEY_NEXT = _("next %s")
LAB_KEY_PREVIOUS = _("previous %s")
LAB_SELECT_BEST_MATCH = _("Select Best Match")
LAB_TRACK_METADATA = _("Track Metadata")
LAB_OUTPUT_OPTIONS = _("Output Options")
LAB_AVAILABLE_FORMATS = _("Available Formats")
LAB_AVAILABLE_QUALITIES = _("Available Qualities for \"%s\"")
LAB_OPTIONS_OUTPUT_DIRECTORY = _("Output Directory:")
LAB_OPTIONS_FILENAME_FORMAT = _("Filename Format:")
LAB_OPTIONS_AUDIO_CLASS = _("Audio Format:")
LAB_OPTIONS_AUDIO_QUALITY = _("Audio Quality:")
LAB_CHOOSE_METADATA = _("multiple metadata choices:")
LAB_CHOICE_PROMPT = _("choice [1]: ")
LAB_DEFAULT_SUFFIX = _(" (default)")
LAB_NO_QUALITY_SETTINGS = _("(no quality settings)")
LAB_PLAY_STATUS = _("Track %(track_number)d/%(track_total)d "
                    "[%(minutes)d:%(seconds)2.2d / "
                    "%(total_minutes)d:%(total_seconds)2.2d] "
                    "%(channels)dch %(sample_rate)dHz "
                    "%(bits_per_sample)d-bit")
LAB_X_OF_Y = _("%(x)d of %(y)d")
LAB_TRACK_X_OF_Y = _("track %(x)d of %(y)d")

# ---- common CLI help ------------------------------------------------------
HELP_VERBOSITY = _("the verbosity level to execute at")
HELP_VERSION = _("display version number and exit")
HELP_TYPE = _("the audio type to convert to")
HELP_QUALITY = _("the quality to store audio at")
HELP_DIR = _("the directory to store new files in")
HELP_FORMAT = _("the format string for new filenames")
HELP_OUTPUT = _("an output file (single input only)")
HELP_JOINT = _("the maximum number of parallel jobs")
HELP_NO_MUSICBRAINZ = _("do not query the MusicBrainz service")
HELP_MUSICBRAINZ_SERVER = _("the MusicBrainz server to query")
HELP_NO_FREEDB = _("do not query the FreeDB service")
HELP_FREEDB_SERVER = _("the FreeDB server to query")
HELP_METADATA_LOOKUP = _("treat the input files as one album and "
                         "look up metadata from online services")
HELP_USE_DEFAULT = _("with -M, use the default blank choice "
                     "instead of the first service match")
HELP_INTERACTIVE = _("edit metadata and output options interactively")
HELP_DEVICES = _("shard encode batches over N accelerator devices "
                 "(data-parallel frames on a Mesh)")
HELP_SAMPLE_RATE = _("convert audio to the given sample rate")
HELP_CHANNELS = _("convert audio to the given channel count")
HELP_BITS_PER_SAMPLE = _("convert audio to the given bits-per-sample")
HELP_REPLAY_GAIN = _("add ReplayGain metadata to output files")
HELP_NO_REPLAY_GAIN = _("do not add ReplayGain metadata")
HELP_CUESHEET = _("a cuesheet to embed or split tracks with")
HELP_ALBUM_NUMBER = _("the album number of this disc")
HELP_ALBUM_TOTAL = _("the total albums of this disc's set")

# ---- track2track -----------------------------------------------------------
DESC_TRACK2TRACK = _("convert audio files from one format to another")
LAB_T2T_USING_METADATA = _("Using metadata: %(album)s")
LAB_T2T_CONVERTED = _("%(source)s -> %(destination)s")
LAB_UNTITLED = _("(untitled)")

# ---- trackcat --------------------------------------------------------------
DESC_TRACKCAT = _("concatenate audio files into one")
HELP_CAT_OUTPUT = _("the output file to write")
ERR_TRACKCAT_SAMPLE_RATES = _("all files must have the same "
                              "sample rate")
ERR_TRACKCAT_CHANNELS = _("all files must have the same channel "
                          "count")
ERR_TRACKCAT_BPS = _("all files must have the same bits-per-sample")

# ---- tracksplit -------------------------------------------------------------
DESC_TRACKSPLIT = _("split an audio file by cuesheet")
ERR_TRACKSPLIT_ONE_FILE = _("you must specify exactly 1 supported "
                            "audio file")
ERR_TRACKSPLIT_NO_CUESHEET = _("you must specify a cuesheet to split "
                               "audio with")
ERR_TRACKSPLIT_SHORT = _("the audio file is shorter than the "
                         "cuesheet's tracks")

# ---- trackcmp ---------------------------------------------------------------
DESC_TRACKCMP = _("compare audio files for PCM equality")
LAB_TRACKCMP_OK = _("%(file1)s <> %(file2)s : OK")
LAB_TRACKCMP_MISMATCH = _("%(file1)s <> %(file2)s : differ at PCM "
                          "frame %(frame)d")
ERR_TRACKCMP_PAIR = _("you must specify 2 files or 2 directories")
ERR_TRACKCMP_MISSING = _("%(filename)s: missing in %(directory)s")

# ---- trackinfo ---------------------------------------------------------------
DESC_TRACKINFO = _("display audio file metadata and attributes")
HELP_INFO_NO_METADATA = _("do not display metadata")
HELP_INFO_LOW_LEVEL = _("display low-level format metadata")
HELP_INFO_BITRATE = _("display the file's bitrate")
HELP_INFO_PERCENTAGE = _("display the wasted-space percentage")
HELP_INFO_CHANNEL_ASSIGNMENT = _("display the file's channel "
                                 "assignment")
LAB_INFO_ATTRIBS = _("%(filename)s: %(minutes)d:%(seconds)2.2d, "
                     "%(channels)dch, %(sample_rate)dHz, "
                     "%(bits_per_sample)d-bit, %(name)s")
LAB_INFO_CHANNELS = _("Assigned Channels:")
LAB_INFO_CHANNEL = _("channel %(channel)d -> %(name)s")
LAB_INFO_CHANNEL_UNDEFINED = _("channel %(channel)d -> undefined")

# ---- tracklength --------------------------------------------------------------
DESC_TRACKLENGTH = _("display the total length of audio files")
LAB_TRACKLENGTH_TOTAL = _("%(hours)d:%(minutes)2.2d:%(seconds)2.2d")

# ---- trackrename ---------------------------------------------------------------
DESC_TRACKRENAME = _("rename audio files by metadata")
LAB_TRACKRENAME_RENAMED = _("%(source)s -> %(destination)s")
ERR_TRACKRENAME_COLLISION = _("unable to rename \"%(source)s\": "
                              "target exists")

# ---- tracktag -------------------------------------------------------------------
DESC_TRACKTAG = _("update audio file metadata")
HELP_TAG_NAME = _("the track's name")
HELP_TAG_ARTIST = _("the track's artist")
HELP_TAG_PERFORMER = _("the track's performer")
HELP_TAG_COMPOSER = _("the track's composer")
HELP_TAG_CONDUCTOR = _("the track's conductor")
HELP_TAG_ALBUM = _("the track's album name")
HELP_TAG_NUMBER = _("the track's number on the album")
HELP_TAG_TRACK_TOTAL = _("the total number of tracks on the album")
HELP_TAG_ALBUM_NUMBER = _("the album's number in its set")
HELP_TAG_ALBUM_TOTAL = _("the total number of albums in the set")
HELP_TAG_YEAR = _("the album's release year")
HELP_TAG_DATE = _("the track's recording date")
HELP_TAG_CATALOG = _("the album's catalog number")
HELP_TAG_ISRC = _("the track's ISRC code")
HELP_TAG_PUBLISHER = _("the album's publisher")
HELP_TAG_MEDIA = _("the album's source media")
HELP_TAG_COPYRIGHT = _("the track's copyright information")
HELP_TAG_COMMENT = _("a track comment")
HELP_TAG_COMMENT_FILE = _("a file containing a track comment")
HELP_TAG_REMOVE = _("remove all existing metadata first")
HELP_TAG_FRONT_COVER = _("an image file of the album's front cover")
HELP_TAG_BACK_COVER = _("an image file of the album's back cover")
HELP_TAG_LEAFLET = _("an image file of the album's leaflet")
HELP_TAG_MEDIA_IMAGE = _("an image file of the album's media")
HELP_TAG_OTHER_IMAGE = _("another image file associated with the "
                         "album")
HELP_TAG_REMOVE_IMAGES = _("remove existing images first")
LAB_TRACKTAG_TAGGED = _("tagged %(filename)s")
ERR_TRACKTAG_COMMENT_IOERROR = _("unable to open comment file "
                                 "%(filename)s")
ERR_TRACKTAG_COMMENT_NOT_UTF8 = _("comment file %(filename)s is not "
                                  "UTF-8 text")

# ---- trackverify -----------------------------------------------------------------
DESC_TRACKVERIFY = _("verify the losslessness of audio files")
HELP_VERIFY_ACCURATERIP = _("verify tracks against the AccurateRip "
                            "database")
LAB_TRACKVERIFY_OK = _("%(filename)s : OK")
LAB_TRACKVERIFY_FAILED = _("%(filename)s : %(error)s")
LAB_TRACKVERIFY_RESULTS = _("Results:")
LAB_TRACKVERIFY_SUCCESS_RATE = _("%(success)d of %(total)d files OK "
                                 "(%(rate).1f%%)")
LAB_ACCURATERIP_MATCH = _("%(filename)s : AccurateRip confidence "
                          "%(confidence)d")
LAB_ACCURATERIP_MISMATCH = _("%(filename)s : AccurateRip MISMATCH")
LAB_ACCURATERIP_NOT_FOUND = _("%(filename)s : not present in "
                              "AccurateRip database")

# ---- tracklint --------------------------------------------------------------------
DESC_TRACKLINT = _("detect and fix broken audio file metadata")
HELP_LINT_FIX = _("fix detected problems")
HELP_LINT_DB = _("the undo database file to store backups in")
HELP_LINT_UNDO = _("undo fixes from the undo database")
ERR_UNDO_REQUIRES_DB = _("--undo requires --db")
LAB_RESTORED = _("* %(filename)s: restored")
LAB_NO_BACKUP = _("* %(filename)s: no stored backup")
LAB_FIXED = _("* %(filename)s: fixed")
LAB_LINT_MESSAGE = _("* %(filename)s: %(message)s")

# ---- trackplay --------------------------------------------------------------------
DESC_TRACKPLAY = _("play audio files")
HELP_PLAY_OUTPUT = _("the audio output to play to")
HELP_PLAY_SHUFFLE = _("play files in random order")
HELP_PLAY_REPEAT = _("repeat the playlist endlessly")
LAB_PLAYING = _("playing %(filename)s")
LAB_STOPPED = _("stopped")
ERR_NO_OUTPUT = _("no available audio output")

# ---- cd2track / cdinfo / cdplay ------------------------------------------------------
DESC_CD2TRACK = _("extract CD audio to files")
DESC_CDINFO = _("display CD information")
DESC_CDPLAY = _("play audio CDs")
HELP_CDROM = _("the CD-ROM device or disc image to read")
HELP_READ_SPEED = _("the speed to read the CD at")
ERR_NO_CDDA = _("physical CD-ROM devices are not supported in this "
                "build; use a cue/toc disc image")
ERR_TRACK_NOT_FOUND = _("track %(track)d not found on disc")
LAB_TRACK_PROGRESS = _("track %(track)d")
LAB_RIPPED_TRACK = _("ripped track %(track)d")
LAB_CDINFO_TRACKS = _("Tracks : %(count)d")
LAB_CDINFO_LENGTH = _("Length : %(minutes)d:%(seconds)2.2d")
LAB_CDINFO_FREEDB = _("FreeDB ID      : %(id)s")
LAB_CDINFO_MUSICBRAINZ = _("MusicBrainz ID : %(id)s")
LAB_CDINFO_ACCURATERIP = _("AccurateRip ID : %(id)s")
LAB_CDINFO_HEADER = _("#  Offset   Length   Seconds")
LAB_CDPLAY_TRACK = _("playing track %(track)d")
LAB_ACCURATERIP_DISC_ID = _("AccurateRip disc ID: %(id)s")
LAB_USING_METADATA = _("Using metadata: %(album)s")

# ---- dvda2track / dvdainfo -----------------------------------------------------------
DESC_DVDA2TRACK = _("extract DVD-Audio titles to files")
DESC_DVDAINFO = _("display DVD-Audio disc information")
HELP_AUDIO_TS = _("the disc's AUDIO_TS directory")
HELP_DVDA_TITLE = _("the title number to extract")
ERR_NO_AUDIO_TS = _("you must specify the disc's AUDIO_TS directory "
                    "with -A")
ERR_INVALID_TITLE = _("title %(title)d not found on disc")
LAB_DVDA_TITLE = _("Title %(title)d")
LAB_DVDA_TRACK = _("title %(title)d - track %(track)2.2d")
LAB_DVDA_EXTRACTED = _("extracted track %(track)d")

# ---- track2cd ---------------------------------------------------------------------------
DESC_TRACK2CD = _("burn audio files to CD or build a disc image")
HELP_T2CD_CUESHEET = _("the cuesheet to arrange tracks with")
HELP_T2CD_IMAGE = _("write a disc image to the given path instead "
                    "of burning")
ERR_T2CD_NO_BURNER = _("no CD burning backend is available; use "
                       "--image to build cue/bin files")
ERR_T2CD_NO_BURNER_IMAGE = _("no CD burning binary found "
                             "(cdrdao/cdrecord); image retained at "
                             "%(cue)s")
LAB_T2CD_WROTE = _("wrote %(cue)s + %(bin)s")
HELP_SPEED = _("the speed to burn the CD at")

# ---- coverdump / covertag / coverview ------------------------------------------------------
DESC_COVERDUMP = _("extract cover art from an audio file")
DESC_COVERTAG = _("attach cover art to audio files")
DESC_COVERVIEW = _("display an audio file's cover art")
HELP_COVERDUMP_PREFIX = _("the prefix for dumped image files")
ERR_NO_IMAGES = _("no images found in %(filename)s")
ERR_NO_IMAGES_PLAIN = _("no images found")
LAB_DUMPED_IMAGE = _("dumped %(output)s")
LAB_VIEWER_UNAVAILABLE = _("viewer unavailable (%(error)s); listing "
                           "instead")

# ---- audiotools-config -----------------------------------------------------------------------
DESC_CONFIG = _("display and edit audiotools configuration")
LAB_CONFIG_SYSTEM = _("System:")
LAB_CONFIG_DEFAULT_TYPE = _("  default type : %(type)s")
LAB_CONFIG_MAX_JOBS = _("  maximum jobs : %(jobs)d")
LAB_CONFIG_FORMATS = _("Available Formats:")
LAB_CONFIG_SET = _("set %(section)s.%(option)s = %(value)s")

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

# ---- channel mask speaker names ---------------------------------------------
# displayed by ChannelMask.__str__ (trackinfo's channel layout row)
MASK_FRONT_LEFT = _("front_left")
MASK_FRONT_RIGHT = _("front_right")
MASK_FRONT_CENTER = _("front_center")
MASK_LFE = _("low_frequency")
MASK_BACK_LEFT = _("back_left")
MASK_BACK_RIGHT = _("back_right")
MASK_FRONT_LEFT_OF_CENTER = _("front_left_of_center")
MASK_FRONT_RIGHT_OF_CENTER = _("front_right_of_center")
MASK_BACK_CENTER = _("back_center")
MASK_SIDE_LEFT = _("side_left")
MASK_SIDE_RIGHT = _("side_right")
MASK_TOP_CENTER = _("top_center")
MASK_TOP_FRONT_LEFT = _("top_front_left")
MASK_TOP_FRONT_CENTER = _("top_front_center")
MASK_TOP_FRONT_RIGHT = _("top_front_right")
MASK_TOP_BACK_LEFT = _("top_back_left")
MASK_TOP_BACK_CENTER = _("top_back_center")
MASK_TOP_BACK_RIGHT = _("top_back_right")

# ---- metadata field labels ---------------------------------------------------
# user-facing names of the MetaData fields (tracktag options,
# trackinfo rows, the TUI's metadata-fill widgets)
METADATA_TRACK_NAME = _("Track Name")
METADATA_TRACK_NUMBER = _("Track Number")
METADATA_TRACK_TOTAL = _("Track Total")
METADATA_ALBUM_NAME = _("Album Name")
METADATA_ARTIST_NAME = _("Artist Name")
METADATA_PERFORMER_NAME = _("Performer Name")
METADATA_COMPOSER_NAME = _("Composer Name")
METADATA_CONDUCTOR_NAME = _("Conductor Name")
METADATA_MEDIA = _("Media")
METADATA_ISRC = _("ISRC")
METADATA_CATALOG = _("Catalog Number")
METADATA_COPYRIGHT = _("Copyright")
METADATA_PUBLISHER = _("Publisher")
METADATA_YEAR = _("Release Year")
METADATA_DATE = _("Recording Date")
METADATA_ALBUM_NUMBER = _("Album Number")
METADATA_ALBUM_TOTAL = _("Album Total")
METADATA_COMMENT = _("Comment")
METADATA_SUFFIX = _("suffix")
METADATA_ALBUM_TRACK_NUMBER = _("album/track number")
METADATA_BASENAME = _("base filename")

# ---- metadata clean() fix messages ------------------------------------------
# emitted by MetaData.clean() implementations and shown by tracklint
CLEAN_REMOVE_DUPLICATE_TAG = _("removed duplicate tag %(field)s")
CLEAN_REMOVE_TRAILING_WHITESPACE = _("removed trailing whitespace "
                                     "from %(field)s")
CLEAN_REMOVE_LEADING_WHITESPACE = _("removed leading whitespace "
                                    "from %(field)s")
CLEAN_REMOVE_LEADING_WHITESPACE_ZEROES = _("removed leading "
                                           "whitespace/zeroes "
                                           "from %(field)s")
CLEAN_REMOVE_LEADING_ZEROES = _("removed leading zeroes from "
                                "%(field)s")
CLEAN_REMOVE_EMPTY_TAG = _("removed empty field %(field)s")
CLEAN_STRIP_WHITESPACE = _("stripped whitespace from %(field)s")
CLEAN_FIX_TAG_FORMATTING = _("fixed formatting of %(field)s")
CLEAN_FIX_IMAGE_FIELDS = _("fixed embedded image metadata fields")
CLEAN_REMOVE_DUPLICATE_ID3V2 = _("removed duplicate ID3v2 tag")
CLEAN_FLAC_REMOVE_SEEKPOINT = _("removed misordered seekpoint")
CLEAN_FLAC_REORDER_SEEKPOINTS = _("reordered seektable seekpoints")
CLEAN_FLAC_MULTIPLE_STREAMINFO = _("removed duplicate STREAMINFO")
CLEAN_FLAC_MULTIPLE_VORBISCOMMENT = _("removed duplicate Vorbis "
                                      "comment block")
CLEAN_FLAC_MULTIPLE_SEEKTABLE = _("removed duplicate seektable")
CLEAN_FLAC_REMOVE_ID3V2 = _("removed ID3v2 tag")
CLEAN_FLAC_REMOVE_ID3V1 = _("removed ID3v1 tag")
CLEAN_FLAC_POPULATE_MD5 = _("populated empty MD5SUM")
CLEAN_FLAC_ADD_CHANNELMASK = _("added WAVEFORMATEXTENSIBLE_CHANNEL_MASK")
CLEAN_WAV_MULTIPLE_FMT_CHUNKS = _("removed duplicate fmt chunk")
CLEAN_WAV_MULTIPLE_DATA_CHUNKS = _("removed duplicate data chunk")
CLEAN_WAV_REORDERED_DATA_CHUNK = _("moved data chunk after fmt chunk")
CLEAN_AIFF_MULTIPLE_COMM_CHUNKS = _("removed duplicate COMM chunk")
CLEAN_AIFF_MULTIPLE_SSND_CHUNKS = _("removed duplicate SSND chunk")
CLEAN_AIFF_REORDERED_SSND_CHUNK = _("moved SSND chunk after COMM "
                                    "chunk")

# ---- compression mode descriptions ---------------------------------------------
# shown by audiotools-config's quality table (reference
# audiotools/text.py COMP_* block); formats publish them via
# COMPRESSION_DESCRIPTIONS
COMP_FLAC_0 = _("least amount of compression")
COMP_FLAC_8 = _("most amount of compression")
COMP_WAVPACK_VERYFAST = _("fastest encode/decode, worst compression")
COMP_WAVPACK_VERYHIGH = _("slowest encode/decode, best compression")
COMP_LAME_0 = _("high quality, larger files")
COMP_LAME_9 = _("low quality, smaller files")
COMP_TWOLAME_64 = _("smallest files")
COMP_TWOLAME_384 = _("highest quality")
COMP_VORBIS_0 = _("smallest files")
COMP_VORBIS_10 = _("highest quality")
COMP_OPUS_0 = _("fastest encode")
COMP_OPUS_10 = _("best quality")
COMP_TTA = _("fixed compression (True Audio has one mode)")
COMP_SHN = _("fixed compression (Shorten has one mode)")
COMP_ALAC = _("fixed compression (Apple Lossless has one mode)")

# ---- ReplayGain pass labels ------------------------------------------------
RG_ADDING_REPLAYGAIN = _("Adding ReplayGain")
RG_APPLYING_REPLAYGAIN = _("Applying ReplayGain")
RG_ADDING_REPLAYGAIN_TO_ALBUM = _("Adding ReplayGain to album "
                                  "%(album)d")
RG_APPLYING_REPLAYGAIN_TO_ALBUM = _("Applying ReplayGain to album "
                                    "%(album)d")
RG_ADDING_REPLAYGAIN_WAIT = _("Adding ReplayGain metadata; this may "
                              "take some time")
RG_APPLYING_REPLAYGAIN_WAIT = _("Applying ReplayGain; this may take "
                                "some time")
RG_REPLAYGAIN_ADDED = _("ReplayGain added")
RG_REPLAYGAIN_ADDED_TO_ALBUM = _("ReplayGain added to album "
                                 "%(album)d")
RG_REPLAYGAIN_APPLIED = _("ReplayGain applied")
RG_REPLAYGAIN_APPLIED_TO_ALBUM = _("ReplayGain applied to album "
                                   "%(album)d")

# ---- audiotools-config (quality table) --------------------------------------
LAB_CONFIG_QUALITY = _("Quality Modes:")
LAB_CONFIG_QUALITY_DEFAULT = _("%(mode)s (default)")
HELP_CONFIG_TYPE = _("set the default audio type")

# ---- misc CLI strings hoisted from the tools --------------------------------
HELP_READ_OFFSET = _("drive read offset, in PCM samples")
HELP_CD_TRACKS = _("track numbers to rip (default: all)")
ERR_FILE_MESSAGE = _("%(filename)s: %(message)s")
ERR_INVALID_FIELD_VALUE = _("invalid value for %(field)s")
ERR_PAIRS_REQUIRED = _("you must specify pairs of files or 2 "
                       "directories")
LAB_CMP_MISSING = _("%(filename)s: missing")
LAB_DVDA_TITLESET = _("Titleset %(titleset)d:")
LAB_COVER_LINE = _("%(index)d: %(type)s %(width)dx%(height)d "
                   "%(mime)s (%(size)d bytes)")
LAB_BITRATE_LINE = _("%(bitrate)4.4s kbps: %(filename)s")
LAB_PERCENTAGE_LINE = _("%(percent)3.3s%%: %(filename)s")

# ---- player GUI (ui.PlayerGUI) ----------------------------------------------
LAB_PLAY_BUTTON = _("Play")
LAB_PAUSE_BUTTON = _("Pause")
LAB_STOP_BUTTON = _("Stop")
LAB_PLAY_TRACK = _("Track")
