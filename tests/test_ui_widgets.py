"""Headless exercise of the urwid TUI widget suite.

Installs tests/urwid_shim.py as the ``urwid`` module (an
API-compatible subset with no terminal rendering), reloads
``audiotools_tpu.ui`` so its gated widget definitions activate, and
drives MetaDataFiller/MetaDataEditor/OutputFiller the way the
interactive CLI modes do — radio swivels, linked-field editing,
wizard paging, collision detection (reference audiotools/ui.py:89,
353, 473)."""

import importlib
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import urwid_shim  # noqa: E402

sys.modules.setdefault("urwid", urwid_shim)

import audiotools_tpu.ui as ui  # noqa: E402

if not ui.AVAILABLE:
    ui = importlib.reload(ui)

from audiotools_tpu.audiofile import MetaData  # noqa: E402
from audiotools_tpu.dispatch import Filename  # noqa: E402
from audiotools_tpu.formats.flac import FlacAudio  # noqa: E402
from audiotools_tpu.formats.wav import WaveAudio  # noqa: E402


pytestmark = pytest.mark.skipif(not ui.AVAILABLE,
                                reason="urwid shim failed to load")


def choices_2x2():
    """two metadata choices covering two tracks"""
    return [
        [MetaData(track_name="Alpha", album_name="Album A",
                  artist_name="Artist", track_number=1),
         MetaData(track_name="Beta", album_name="Album A",
                  artist_name="Artist", track_number=2)],
        [MetaData(track_name="Gamma", album_name="Album B",
                  track_number=1),
         MetaData(track_name="Delta", album_name="Album B",
                  track_number=2)],
    ]


def test_metadata_editor_roundtrip():
    """values flow from MetaData into widgets and back out"""
    editor = ui.MetaDataEditor(
        [(0, "track 1", MetaData(track_name="One", track_number=1,
                                 album_name="LP")),
         (1, "track 2", MetaData(track_name="Two", track_number=2,
                                 album_name="LP"))])
    result = dict(editor.metadata())
    assert result[0].track_name == "One"
    assert result[0].track_number == 1
    assert result[0].album_name == "LP"
    assert result[1].track_name == "Two"
    assert result[1].track_number == 2


def test_metadata_editor_linked_fields():
    """album_name is equal across tracks, so it is linked: editing
    one track's album updates every track (reference LinkedWidgets)"""
    editor = ui.MetaDataEditor(
        [(0, "track 1", MetaData(track_name="One", album_name="LP")),
         (1, "track 2", MetaData(track_name="Two", album_name="LP"))])
    # edit through track 0's linked album widget
    cell = editor.metadata_edits[0].album_name
    assert cell.checkbox.get_state()        # linked
    cell.linked_widget.set_edit_text("Renamed LP")
    result = dict(editor.metadata())
    assert result[0].album_name == "Renamed LP"
    assert result[1].album_name == "Renamed LP"
    # track names differ, so they are never linked
    assert not editor.metadata_edits[0].track_name.checkbox.get_state()


def test_metadata_editor_unlink_field():
    """unchecking the link box detaches a track's field"""
    editor = ui.MetaDataEditor(
        [(0, "track 1", MetaData(track_name="One", album_name="LP")),
         (1, "track 2", MetaData(track_name="Two", album_name="LP"))])
    cell = editor.metadata_edits[1].album_name
    cell.checkbox.set_state(False)          # detach
    cell.unlinked_widget.set_edit_text("Solo Album")
    result = dict(editor.metadata())
    assert result[0].album_name == "LP"
    assert result[1].album_name == "Solo Album"


def test_metadata_editor_swivel_navigation():
    """F1/F2 swivel moves across fields, then tracks"""
    editor = ui.MetaDataEditor(
        [(0, "track 1", MetaData(track_name="One")),
         (1, "track 2", MetaData(track_name="Two"))])
    # with multiple tracks the initial selection is the track_name
    # field radio
    first = editor.selected_radio
    editor.select_next_item()
    assert editor.selected_radio is not first
    editor.select_previous_item()
    assert editor.selected_radio is first


def test_metadata_filler_choice_switching():
    """the match radio selects which choice is edited and returned"""
    status = urwid_shim.Text("")
    filler = ui.MetaDataFiller(["track 1", "track 2"],
                               choices_2x2(), status)
    first = list(filler.populated_metadata())
    assert [m.track_name for m in first] == ["Alpha", "Beta"]

    # switch to the second match via its radio button
    filler.select_match(None, True, 1)
    second = list(filler.populated_metadata())
    assert [m.track_name for m in second] == ["Gamma", "Delta"]
    assert second[0].album_name == "Album B"


def test_metadata_filler_swivel_status():
    """swiveling updates the status bar with F1/F2 key hints"""
    status = urwid_shim.Text("")
    filler = ui.MetaDataFiller(["track 1", "track 2"],
                               choices_2x2(), status)
    filler.select_next_item()
    (text, _attrs) = (status._markup, None)
    assert text  # status bar was populated with key hints


def test_output_filler_flow(tmp_path):
    """the full wizard: metadata page -> options page -> completion"""
    src_dir = tmp_path / "src"
    src_dir.mkdir()
    inputs = [Filename(str(src_dir / "a.wav")),
              Filename(str(src_dir / "b.wav"))]
    filler = ui.OutputFiller(
        track_labels=["track 1", "track 2"],
        metadata_choices=choices_2x2(),
        input_filenames=inputs,
        output_directory=str(tmp_path / "out"),
        format_string="%(track_number)2.2d - %(track_name)s.%(suffix)s",
        output_class=FlacAudio,
        quality="8")
    # page forward (fills the options page from edited metadata)
    filler.wizard.next_page()
    (cls, quality, filenames) = filler.options.selected_options()
    assert cls is FlacAudio
    assert quality == "8"
    assert [os.path.basename(str(f)) for f in filenames] == \
        ["01 - Alpha.flac", "02 - Beta.flac"]

    # completing with valid options exits the loop uncancelled
    with pytest.raises(urwid_shim.ExitMainLoop):
        filler.complete()
    assert not filler.cancelled()
    tracks = list(filler.output_tracks())
    assert len(tracks) == 2
    assert tracks[0][3].track_name == "Alpha"


def test_output_filler_detects_duplicates(tmp_path):
    """a format string without distinguishing fields collides"""
    inputs = [Filename(str(tmp_path / "a.wav")),
              Filename(str(tmp_path / "b.wav"))]
    filler = ui.OutputFiller(
        track_labels=["track 1", "track 2"],
        metadata_choices=[[MetaData(album_name="LP"),
                           MetaData(album_name="LP")]],
        input_filenames=inputs,
        output_directory=str(tmp_path),
        format_string="same.%(suffix)s",
        output_class=FlacAudio,
        quality="8")
    filler.wizard.next_page()
    assert filler.options.has_duplicates
    # completion is refused (no ExitMainLoop)
    filler.complete()
    assert filler.cancelled()


def test_output_filler_detects_collisions(tmp_path):
    """writing onto an input file is refused"""
    inputs = [Filename(str(tmp_path / "a.wav"))]
    filler = ui.OutputFiller(
        track_labels=["track 1"],
        metadata_choices=[[MetaData(track_name="A")]],
        input_filenames=inputs,
        output_directory=str(tmp_path),
        format_string="a.%(suffix)s",
        output_class=WaveAudio,
        quality="")
    filler.wizard.next_page()
    assert filler.options.has_collisions
    filler.complete()
    assert filler.cancelled()


def test_output_filler_cancel(tmp_path):
    filler = ui.OutputFiller(
        track_labels=["track 1"],
        metadata_choices=[[MetaData(track_name="A")]],
        input_filenames=[Filename(str(tmp_path / "a.wav"))],
        output_directory=str(tmp_path / "out"),
        format_string="%(track_name)s.%(suffix)s",
        output_class=FlacAudio,
        quality="8")
    with pytest.raises(urwid_shim.ExitMainLoop):
        filler.exit()
    assert filler.cancelled()


def test_single_output_filler(tmp_path):
    """single-track flow incl. the output==input refusal"""
    input_name = Filename(str(tmp_path / "in.wav"))
    filler = ui.SingleOutputFiller(
        track_label="track 1",
        metadata_choices=[MetaData(track_name="Solo")],
        input_filenames=[input_name],
        output_file=str(tmp_path / "in.wav"),
        output_class=FlacAudio,
        quality="8")
    # output == input: completion refused, status populated
    filler.complete()
    assert filler.cancelled()
    assert filler.status._markup

    filler.options.output_filename.set_edit_text(
        str(tmp_path / "out.flac"))
    with pytest.raises(urwid_shim.ExitMainLoop):
        filler.complete()
    assert not filler.cancelled()
    (cls, filename, quality, metadata) = filler.output_track()
    assert cls is FlacAudio
    assert quality == "8"
    assert str(filename).endswith("out.flac")
    assert metadata.track_name == "Solo"


def test_select_one():
    changed = []
    sel = ui.SelectOne([("first", 1), ("second", 2), ("third", 3)],
                       2, on_change=changed.append)
    assert sel.selection() == 2
    sel.set_selection(3)
    assert sel.selection() == 3
    assert changed == [3]


def test_output_options_quality_follows_class(tmp_path):
    """switching the audio class refreshes the quality selector"""
    options = ui.OutputOptions(
        output_dir=str(tmp_path),
        format_string="%(basename)s.%(suffix)s",
        audio_class=FlacAudio,
        quality="8",
        input_filenames=[Filename(str(tmp_path / "x.wav"))],
        metadatas=[None])
    assert options.selected_options()[1] == "8"
    options.audio_class.set_selection(WaveAudio)
    (cls, quality, _names) = options.selected_options()
    assert cls is WaveAudio
    assert quality == WaveAudio.DEFAULT_COMPRESSION


def test_down_edit_enter_moves_down():
    edit = ui.DownEdit(edit_text="abc")
    assert edit.keypress((10,), "enter") == "down"


def test_tab_complete(tmp_path):
    (tmp_path / "alpha").mkdir()
    (tmp_path / "alps").mkdir()
    (tmp_path / "beta").mkdir()
    base = str(tmp_path) + os.sep
    # unique: completes with trailing separator
    (done, ok) = ui.tab_complete(base + "b")
    assert ok and done == base + "beta" + os.sep
    # ambiguous: extends to the common prefix
    (partial, ok) = ui.tab_complete(base + "a")
    assert not ok and partial == base + "alp"
    # no match: unchanged
    assert ui.tab_complete(base + "zz") == (base + "zz", False)


def test_tab_complete_file(tmp_path):
    (tmp_path / "song.flac").write_bytes(b"")
    (tmp_path / "songs").mkdir()
    base = str(tmp_path) + os.sep
    (done, ok) = ui.tab_complete_file(base + "song.")
    assert ok and done == base + "song.flac"


def test_pop_directory():
    assert ui.pop_directory("/a/b/c/") == "/a/b/"
    assert ui.pop_directory("/a/b/c") == "/a/b/"
    assert ui.pop_directory("/a/") == "/"


def test_player_tty_progress_line():
    class FakePlayer:
        def progress(self):
            return (44100 * 30, 44100 * 60)

        def toggle_play_pause(self):
            pass

        def stop(self):
            pass

    tty = ui.PlayerTTY(FakePlayer())
    tty.set_metadata(2, 9, 2, 44100, 16)
    line = tty.progress_line(44100 * 30, 44100 * 60)
    assert "2/9" in line
    assert "0:30" in line
    assert "1:00" in line


class _FakePlayer:
    """records command calls; a Player-compatible stand-in"""

    def __init__(self):
        self.calls = []
        self._progress = (0, 100)
        self._state = 0

    def open(self, track):
        self.calls.append(("open", track))

    def play(self):
        self.calls.append(("play", None))
        self._state = 2

    def toggle_play_pause(self):
        self.calls.append(("toggle", None))
        self._state = 2 if self._state != 2 else 1

    def stop(self):
        self.calls.append(("stop", None))
        self._state = 0

    def progress(self):
        return self._progress

    def state(self):
        return self._state


def _player_gui():
    player = _FakePlayer()
    tracks = [("one", 10, "t1"), ("two", 20, "t2"), ("three", 5, "t3")]
    return (player, ui.PlayerGUI(player, tracks, 35))


def test_player_gui_select_track_opens_and_plays():
    (player, gui) = _player_gui()
    gui.track_buttons[1].set_state(True)
    assert ("open", "t2") in player.calls
    assert ("play", None) in player.calls
    assert gui.track_index == 1
    assert gui.track_number.get_text()[0] == "2/3"


def test_player_gui_play_pause_from_idle_opens_first():
    (player, gui) = _player_gui()
    gui.play_pause()
    assert ("open", "t1") in player.calls
    assert ("toggle", None) in player.calls
    assert gui.track_index == 0


def test_player_gui_next_previous_navigation():
    (player, gui) = _player_gui()
    gui.track_buttons[0].set_state(True)
    gui.next_track()
    assert gui.track_index == 1
    gui.next_track()
    assert gui.track_index == 2
    gui.next_track()                      # past the end -> stop
    assert ("stop", None) in player.calls
    gui.previous_track()
    assert gui.track_index == 1


def test_player_gui_status_updates_progress_and_label():
    (player, gui) = _player_gui()
    gui.track_buttons[0].set_state(True)   # opens + plays
    player._progress = (50, 100)
    gui.update_status()
    assert gui.progress.current == 50
    assert gui.play_pause_button.label == "Pause"
    # end of track auto-advances
    player._progress = (100, 100)
    gui.update_status()
    assert gui.track_index == 1
