"""trackplay: play audio tracks in the terminal.

Rebuild of the reference ``trackplay`` tool over the player engine
(``audiotools_tpu.player``); urwid is optional upstream, so this build
ships the non-interactive progress mode with the same playback core.
"""

from __future__ import annotations

import argparse
import sys
import time

from . import add_common_arguments
from ..utils.messenger import Messenger
from ..text import (DESC_TRACKPLAY, HELP_PLAY_OUTPUT,
                    HELP_PLAY_SHUFFLE, HELP_PLAY_REPEAT,
                    ERR_1_FILE_REQUIRED,
                    LAB_PLAYING, LAB_STOPPED)


def main(argv=None):
    parser = argparse.ArgumentParser(
        prog="trackplay",
        description=DESC_TRACKPLAY)
    add_common_arguments(parser)
    parser.add_argument("-o", "--output", dest="output", default=None,
                        help=HELP_PLAY_OUTPUT)
    parser.add_argument("--shuffle", action="store_true",
                        default=False, help=HELP_PLAY_SHUFFLE)
    parser.add_argument("--repeat", action="store_true",
                        default=False, help=HELP_PLAY_REPEAT)
    parser.add_argument("-I", "--interactive",
                        action="store_true", default=False,
                        dest="interactive")
    parser.add_argument("-T", "--track-replaygain",
                        action="store_true", default=False,
                        dest="track_replaygain")
    parser.add_argument("-A", "--album-replaygain",
                        action="store_true", default=False,
                        dest="album_replaygain")
    parser.add_argument("filenames", nargs="+")
    options = parser.parse_args(argv)
    msg = Messenger("trackplay", options)

    from ..dispatch import open_files
    from ..player import Player, open_output

    tracks = open_files(options.filenames, messenger=msg)
    if len(tracks) == 0:
        msg.error(ERR_1_FILE_REQUIRED)
        return 1
    if options.shuffle:
        import random
        random.shuffle(tracks)

    try:
        output = open_output(options.output)
    except ValueError as err:
        msg.error(str(err))
        return 1

    player = Player(output)
    if options.track_replaygain or options.album_replaygain:
        from ..player import RG_TRACK_GAIN, RG_ALBUM_GAIN
        player.set_replay_gain(RG_TRACK_GAIN
                               if options.track_replaygain
                               else RG_ALBUM_GAIN)

    # interactive urwid player (reference trackplay's TrackplayGUI
    # over ui.PlayerGUI); falls back to the line-oriented loop when
    # urwid or a tty is unavailable
    from .. import ui
    if options.interactive and not ui.AVAILABLE:
        ui.not_available_message(msg)
        return 1
    if ui.AVAILABLE and (options.interactive or
                         (sys.stdout.isatty() and
                          sys.stdin.isatty())):
        import urwid

        def entries():
            for track in tracks:
                meta = track.get_metadata()
                label = (meta.track_name if (meta is not None and
                                             meta.track_name)
                         else track.filename)
                yield (label, track.seconds_length(), track)

        gui = ui.PlayerGUI(player, list(entries()),
                           sum(t.seconds_length() for t in tracks))
        # end-of-track notices from the worker thread set a flag the
        # alarm tick consumes (urwid widgets are not thread-safe)
        player.set_next_track_callback(gui.on_track_finished)
        loop = urwid.MainLoop(gui, ui.urwid_style(),
                              unhandled_input=lambda key:
                              _gui_keys(gui, key))

        def tick(loop_, _data):
            gui.update_status()
            loop_.set_alarm_in(0.25, tick)

        loop.set_alarm_in(0.25, tick)
        try:
            loop.run()
        finally:
            player.close()
        return 0

    try:
      while True:
        for track in tracks:
            msg.info(LAB_PLAYING % {"filename": track.filename})
            player.open(track)
            player.play()
            # wait for the worker to start playing (command queue is
            # asynchronous), then until it stops at EOF
            deadline = time.time() + 10
            while player.state() == 0 and time.time() < deadline:
                time.sleep(0.05)
            while player.state() != 0:
                time.sleep(0.1)
        if not options.repeat:
            break
    except KeyboardInterrupt:
        msg.info(LAB_STOPPED)
    finally:
        player.close()
    return 0


def _gui_keys(gui, key):
    """global key bindings for the urwid player (reference
    trackplay:195-213)"""
    import urwid
    if key in ("q", "Q", "esc"):
        raise urwid.ExitMainLoop()
    elif key == " ":
        gui.play_pause()
    elif key in ("n", "N"):
        gui.next_track()
    elif key in ("p", "P"):
        gui.previous_track()
    elif key in ("s", "S"):
        gui.stop()


if __name__ == "__main__":
    sys.exit(main())
