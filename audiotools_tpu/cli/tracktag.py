"""tracktag: update audio file metadata.

Rebuild of the reference ``tracktag`` tool: per-field metadata setting,
field removal, cover art embedding, and ReplayGain application.
"""

from __future__ import annotations

from .. import text as text_err

import argparse
import sys

from . import add_common_arguments, add_lookup_arguments
from ..utils.messenger import Messenger
from ..text import (DESC_TRACKTAG, HELP_TAG_NAME, HELP_TAG_ARTIST,
                    HELP_TAG_PERFORMER, HELP_TAG_COMPOSER,
                    HELP_TAG_CONDUCTOR, HELP_TAG_ALBUM,
                    HELP_TAG_CATALOG, HELP_TAG_NUMBER,
                    HELP_TAG_TRACK_TOTAL, HELP_TAG_ALBUM_NUMBER,
                    HELP_TAG_ALBUM_TOTAL, HELP_TAG_ISRC,
                    HELP_TAG_PUBLISHER, HELP_TAG_MEDIA,
                    HELP_TAG_YEAR, HELP_TAG_DATE, HELP_TAG_COPYRIGHT,
                    HELP_TAG_COMMENT, HELP_TAG_REMOVE,
                    HELP_TAG_REMOVE_IMAGES, HELP_TAG_FRONT_COVER,
                    HELP_REPLAY_GAIN, HELP_INTERACTIVE,
                    HELP_TAG_COMMENT_FILE,
                    ERR_TRACKTAG_COMMENT_IOERROR,
                    ERR_TRACKTAG_COMMENT_NOT_UTF8,
                    ERR_1_FILE_REQUIRED, LAB_TRACKTAG_TAGGED)


FIELD_OPTIONS = [
    ("--name", "track_name", HELP_TAG_NAME),
    ("--artist", "artist_name", HELP_TAG_ARTIST),
    ("--performer", "performer_name", HELP_TAG_PERFORMER),
    ("--composer", "composer_name", HELP_TAG_COMPOSER),
    ("--conductor", "conductor_name", HELP_TAG_CONDUCTOR),
    ("--album", "album_name", HELP_TAG_ALBUM),
    ("--catalog", "catalog", HELP_TAG_CATALOG),
    ("--number", "track_number", HELP_TAG_NUMBER),
    ("--track-total", "track_total", HELP_TAG_TRACK_TOTAL),
    ("--album-number", "album_number", HELP_TAG_ALBUM_NUMBER),
    ("--album-total", "album_total", HELP_TAG_ALBUM_TOTAL),
    ("--ISRC", "ISRC", HELP_TAG_ISRC),
    ("--publisher", "publisher", HELP_TAG_PUBLISHER),
    ("--media-type", "media", HELP_TAG_MEDIA),
    ("--year", "year", HELP_TAG_YEAR),
    ("--date", "date", HELP_TAG_DATE),
    ("--copyright", "copyright", HELP_TAG_COPYRIGHT),
    ("--comment", "comment", HELP_TAG_COMMENT),
]


def main(argv=None):
    parser = argparse.ArgumentParser(
        prog="tracktag",
        description=DESC_TRACKTAG)
    add_common_arguments(parser)
    for (flag, field, help_text) in FIELD_OPTIONS:
        parser.add_argument(flag, dest=field, default=None,
                            help=help_text)
    parser.add_argument("-r", "--replace", action="store_true",
                        default=False, help=HELP_TAG_REMOVE)
    parser.add_argument("-I", "--interactive", action="store_true",
                        default=False, dest="interactive",
                        help=HELP_INTERACTIVE)
    parser.add_argument("--remove-images", action="store_true",
                        default=False, help=HELP_TAG_REMOVE_IMAGES)
    parser.add_argument("--front-cover", dest="front_cover",
                        default=None, help=HELP_TAG_FRONT_COVER)
    parser.add_argument("--replay-gain", action="store_true",
                        dest="add_replay_gain", default=False,
                        help=HELP_REPLAY_GAIN)
    parser.add_argument("-j", "--joint", dest="max_processes",
                        type=int, default=None)
    parser.add_argument("--comment-file", dest="comment_file",
                        default=None, help=HELP_TAG_COMMENT_FILE)
    # per-field removal switches (reference tracktag --remove-*):
    # the flag name matches the setter flag's name
    for (flag, field, _help) in FIELD_OPTIONS:
        parser.add_argument("--remove-" + flag[2:],
                            dest="remove_" + field,
                            action="store_true", default=False)
    add_lookup_arguments(parser)
    parser.add_argument("filenames", nargs="+")

    options = parser.parse_args(argv)
    msg = Messenger("tracktag", options)

    from ..dispatch import open_files
    from ..audiofile import MetaData, Image

    integer_fields = {"track_number", "track_total", "album_number",
                      "album_total"}
    updates = {}
    for (_flag, field, _help) in FIELD_OPTIONS:
        value = getattr(options, field)
        if value is not None:
            if field in integer_fields:
                try:
                    updates[field] = int(value)
                except ValueError:
                    msg.error(text_err.ERR_INVALID_FIELD_VALUE %
                              {"field": field})
                    return 1
            else:
                updates[field] = value

    removals = [field for (_flag, field, _help) in FIELD_OPTIONS
                if getattr(options, "remove_" + field)]

    if options.comment_file is not None:
        try:
            with open(options.comment_file, "rb") as f:
                comment_bytes = f.read()
        except IOError:
            msg.error(ERR_TRACKTAG_COMMENT_IOERROR %
                      {"filename": options.comment_file})
            return 1
        try:
            updates["comment"] = comment_bytes.decode("utf-8")
        except UnicodeDecodeError:
            msg.error(ERR_TRACKTAG_COMMENT_NOT_UTF8 %
                      {"filename": options.comment_file})
            return 1

    audiofiles = open_files(options.filenames, sorted=False,
                            messenger=msg)
    if len(audiofiles) == 0:
        msg.error(ERR_1_FILE_REQUIRED)
        return 1

    # album-wide metadata lookup pre-pass (reference tracktag -M):
    # looked-up fields seed each track's metadata; explicit
    # command-line fields still win
    if options.metadata_lookup:
        from ..services.lookup import track_metadata_lookup
        from ..dispatch import sorted_tracks as _sort
        choices = track_metadata_lookup(
            audiofiles,
            musicbrainz_server=options.musicbrainz_server,
            musicbrainz_port=options.musicbrainz_port,
            freedb_server=options.freedb_server,
            freedb_port=options.freedb_port,
            use_musicbrainz=options.use_musicbrainz,
            use_freedb=options.use_freedb)
        chosen = choices[-1] if options.use_default else choices[0]
        for (track, looked_up) in zip(_sort(audiofiles), chosen):
            existing = track.get_metadata()
            if existing is not None:
                for field in existing.FIELDS:
                    if getattr(looked_up, field) is None:
                        setattr(looked_up, field,
                                getattr(existing, field))
            track.set_metadata(looked_up)

    # interactive mode: edit every track's metadata through the
    # MetaDataFiller swivel editor (reference tracktag -I over
    # audiotools/ui.py:353); command-line field options pre-seed the
    # edited values
    if options.interactive:
        from .. import ui
        if not ui.AVAILABLE:
            ui.not_available_message(msg)
            return 1
        import urwid
        seeded = []
        for track in audiofiles:
            metadata = track.get_metadata()
            if metadata is None:
                from ..audiofile import MetaData as MD
                metadata = MD()
            for (field, value) in updates.items():
                setattr(metadata, field, value)
            seeded.append(metadata)
        status = urwid.Text("")
        filler = ui.MetaDataFiller(
            [str(t.filename) for t in audiofiles],
            [seeded], status)
        edited = {"done": False}

        def unhandled(key):
            if key == "f1":
                filler.select_previous_item()
            elif key == "f2":
                filler.select_next_item()
            elif key == "enter":
                edited["done"] = True
                raise urwid.ExitMainLoop()
            elif key == "esc":
                raise urwid.ExitMainLoop()

        urwid.MainLoop(urwid.Frame(body=filler, footer=status),
                       ui.urwid_style(),
                       unhandled_input=unhandled).run()
        if not edited["done"]:
            return 0
        for (track, metadata) in zip(audiofiles,
                                     filler.populated_metadata()):
            try:
                track.set_metadata(metadata)
                msg.info(LAB_TRACKTAG_TAGGED %
                         {"filename": track.filename})
            except (IOError, ValueError) as err:
                msg.error(text_err.ERR_FILE_MESSAGE %
                          {"filename": track.filename,
                           "message": err})
                return 1
        return 0

    for track in audiofiles:
        try:
            if options.replace:
                metadata = MetaData(**updates)
            else:
                metadata = track.get_metadata()
                if metadata is None:
                    metadata = MetaData()
                for field in removals:
                    delattr(metadata, field)
                for (field, value) in updates.items():
                    setattr(metadata, field, value)

            if options.remove_images:
                for image in metadata.images():
                    metadata.delete_image(image)
            if options.front_cover is not None:
                with open(options.front_cover, "rb") as f:
                    metadata.add_image(Image.new(f.read(), "", 0))

            track.set_metadata(metadata)
        except (IOError, ValueError) as err:
            msg.error(text_err.ERR_FILE_MESSAGE %
                          {"filename": track.filename,
                           "message": err})
            return 1

    if options.add_replay_gain:
        from .. import text as text_mod
        classes = {f.__class__ for f in audiofiles}
        added = False
        for cls in classes:
            if cls.supports_replay_gain():
                if not added:
                    msg.info(text_mod.RG_ADDING_REPLAYGAIN_WAIT)
                cls.add_replay_gain([f.filename for f in audiofiles
                                     if f.__class__ is cls])
                added = True
        if added:
            msg.info(text_mod.RG_REPLAYGAIN_ADDED)

    return 0


if __name__ == "__main__":
    sys.exit(main())
