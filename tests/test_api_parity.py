"""Package-root API parity with the reference ``audiotools`` package:
every public name the reference exports from its root exists here,
plus behavior checks for the helper utilities.

Reference: /root/reference/audiotools/__init__.py top-level names.
"""

import numpy as np
import pytest

import audiotools_tpu as at


REFERENCE_ROOT_NAMES = [
    # core protocol + formats (long-standing)
    "open", "open_files", "open_directory", "file_type",
    "sorted_tracks", "group_tracks", "AudioFile", "MetaData",
    "AlbumMetaData", "Image", "ReplayGain", "ChannelMask",
    "PCMReader", "PCMCat", "BufferedPCMReader", "PCMConverter",
    "PCMReaderWindow", "pcm_cmp", "pcm_frame_cmp", "pcm_split",
    "Sheet", "SheetTrack", "SheetIndex", "CDDA", "CDTrackReader",
    "ExecProgressQueue", "TemporaryFile", "Filename",
    "calculate_replay_gain", "metadata_lookup", "accuraterip_lookup",
    "FRAMELIST_SIZE", "MAX_JOBS", "TYPE_MAP", "AVAILABLE_TYPES",
    # helpers (reference package-root utilities)
    "AmbiguousAudioType", "CDTrackLog", "DummyAudioFile",
    "DummyOutput", "DuplicateFile", "DuplicateOutputFile",
    "InvalidFilenameFormat", "Messenger", "OptionParser",
    "OutputFileIsInput", "ProgressDisplay", "ProgressRow",
    "RawConfigParser", "ReplayGainProgressDisplay", "SheetException",
    "SingleProgressDisplay", "UnknownAudioType",
    "UnsupportedTracknameField", "accuraterip_sheet_lookup",
    "applicable_replay_gain", "at_a_time", "build_timestamp",
    "filename_to_type", "get_umask", "ignore_sigint", "iter_first",
    "iter_last", "khz", "most_numerous", "output_list",
    "output_progress", "output_table", "output_table_blank",
    "output_table_divider", "output_table_row", "output_text",
    "parse_timestamp", "read_sheet", "stripped_pcm_cmp",
    "InvalidImage",
]


@pytest.mark.parametrize("name", REFERENCE_ROOT_NAMES)
def test_root_name_exists(name):
    assert hasattr(at, name), name


def test_khz():
    assert at.khz(44100) == "44.1kHz"
    assert at.khz(48000) == "48kHz"
    assert at.khz(8000) == "8kHz"
    assert at.khz(176400) == "176.4kHz"


def test_at_a_time():
    assert list(at.at_a_time(10, 3)) == [3, 3, 3, 1]
    assert list(at.at_a_time(9, 3)) == [3, 3, 3, 0]


def test_iter_first_last():
    assert list(at.iter_first(iter([1, 2, 3]))) == \
        [(True, 1), (False, 2), (False, 3)]
    assert list(at.iter_first(iter([]))) == [(True, None)]
    assert list(at.iter_last(iter([1, 2, 3]))) == \
        [(False, 1), (False, 2), (True, 3)]
    assert list(at.iter_last(iter([]))) == [(True, None)]


def test_most_numerous():
    assert at.most_numerous([1, 2, 2, 3]) == 2
    assert at.most_numerous([], empty_list="empty") == "empty"
    assert at.most_numerous([1, 2, 3], all_differ="differ") == "differ"
    assert at.most_numerous([7]) == 7


def test_filename_to_type():
    assert at.filename_to_type("/x/y.flac").NAME == "flac"
    assert at.filename_to_type("a.wav").NAME == "wav"
    with pytest.raises(at.UnknownAudioType):
        at.filename_to_type("a.xyz")
    with pytest.raises(at.UnknownAudioType):
        at.filename_to_type("suffixless")


def test_output_text_widths_and_ansi():
    t = at.output_text("ab中", fg_color="red")
    assert len(t) == 4                       # CJK char is 2 cells
    assert str(t) == "ab中"
    assert t.format(False) == "ab中"
    assert t.format(True).startswith("\033[31m")
    assert t.format(True).endswith("\033[0m")
    assert str(t.head(3)) == "ab"            # can't split the wide char
    assert str(t.tail(2)) == "中"
    lst = at.output_list(["ab", t], style="bold")
    assert len(lst) == 6
    assert lst.format(True).startswith("\033[1m")


def test_output_progress():
    assert at.output_progress("x", 2, 10) == "[ 2/10]  x"
    assert at.output_progress("x", 1, 1) == "x"


def test_stripped_pcm_cmp():
    import io
    from audiotools_tpu import pcm
    from audiotools_tpu.pcmstream import PCMReader

    sig = np.arange(-500, 500, dtype=np.int32).reshape(-1, 2)
    padded = np.concatenate(
        [np.zeros((16, 2), np.int32), sig, np.zeros((16, 2), np.int32)])

    def reader(arr):
        raw = pcm.FrameList._wrap(arr, 16).to_bytes(False, True)
        return PCMReader(io.BytesIO(raw), 44100, 2, 3, 16)

    assert at.stripped_pcm_cmp(reader(sig), reader(padded))
    other = sig.copy()
    other[100, 0] ^= 3
    assert not at.stripped_pcm_cmp(reader(sig), reader(other))


def test_cd_track_log_format():
    log = at.CDTrackLog()
    log[12] = 2
    log[6] = 1
    assert str(log) == ("2 rderr, 1 skip, 0 atom, 0 edge, "
                        "0 drop, 0 dup, 0 drift")


def test_applicable_replay_gain():
    class _T:
        def __init__(self, rate, ch):
            self._rate = rate
            self._ch = ch

        def sample_rate(self):
            return self._rate

        def channels(self):
            return self._ch

    assert at.applicable_replay_gain([_T(44100, 2), _T(44100, 2)])
    assert not at.applicable_replay_gain([_T(44100, 2), _T(48000, 2)])
    assert not at.applicable_replay_gain([_T(44100, 6)])
    assert not at.applicable_replay_gain([_T(44055, 2)])


def test_dummy_output_interface():
    out = at.DummyOutput()
    out.write("x")
    out.flush()
    assert not out.isatty()
    out.close()


def test_format_level_parity(tmp_path):
    """chunk/block-level public APIs on the container formats"""
    import io
    from audiotools_tpu import pcm
    from audiotools_tpu.pcmstream import PCMReader
    from audiotools_tpu.formats.wav import WaveAudio, RIFF_Chunk
    from audiotools_tpu.formats.aiff import AiffAudio, AIFF_Chunk
    from audiotools_tpu.formats.wavpack import WavPackAudio
    from audiotools_tpu.formats.flac import FlacAudio
    from audiotools_tpu.formats.au import AuAudio

    arr = (np.arange(20000, dtype=np.int32) % 3001 - 1500).reshape(
        -1, 2)

    def reader():
        raw = pcm.FrameList._wrap(arr, 16).to_bytes(False, True)
        return PCMReader(io.BytesIO(raw), 44100, 2, 3, 16)

    # WAV chunk round trip
    w = WaveAudio.from_pcm(str(tmp_path / "a.wav"), reader())
    chunks = list(w.chunks())
    assert [c.id for c in chunks] == [b"fmt ", b"data"]
    w2 = WaveAudio.wave_from_chunks(str(tmp_path / "b.wav"), chunks)
    assert (open(w.filename, "rb").read() ==
            open(w2.filename, "rb").read())

    # AIFF chunk round trip
    a = AiffAudio.from_pcm(str(tmp_path / "a.aiff"), reader())
    chunks = list(a.chunks())
    assert [c.id for c in chunks] == [b"COMM", b"SSND"]
    a2 = AiffAudio.aiff_from_chunks(str(tmp_path / "b.aiff"), chunks)
    assert (open(a.filename, "rb").read() ==
            open(a2.filename, "rb").read())

    # WavPack container introspection
    v = WavPackAudio.from_pcm(str(tmp_path / "a.wv"), reader())
    assert len(list(v.blocks())) >= 1
    functions = {f for (f, _n, _s, _d) in v.sub_blocks()}
    assert 1 in functions                  # embedded RIFF header
    fmt = v.fmt_chunk()
    from audiotools_tpu.formats.wav import parse_fmt
    (ch, sr, bps, _mask) = parse_fmt(fmt.read_bytes(16))
    assert (ch, sr, bps) == (2, 44100, 16)

    # FLAC metadata_length
    f = FlacAudio.from_pcm(str(tmp_path / "a.flac"), reader())
    assert f.metadata_length() > 34        # STREAMINFO + padding

    # AU pcm_split
    au = AuAudio.from_pcm(str(tmp_path / "a.au"), reader())
    (header, footer) = au.pcm_split()
    assert header.startswith(b".snd") and footer == b""


def test_mp3_frame_length_values():
    from audiotools_tpu.formats.mp3 import MP3Audio

    class _M(MP3Audio):
        def __init__(self):
            pass

    m = _M()
    # MPEG-1 layer III 128 kbps @ 44100 -> 417 (+1 with padding)
    assert m.frame_length(3, 1, 9, 0, 0) == 417
    assert m.frame_length(3, 1, 9, 0, 1) == 418
    # MPEG-1 layer I 256 kbps @ 48000 -> 256 bytes
    assert m.frame_length(3, 3, 8, 1, 0) == 256
    with pytest.raises(ValueError):
        m.frame_length(3, 1, 0, 0, 0)     # free-format bitrate


def test_audioplayer_sync_core(tmp_path):
    """the synchronous AudioPlayer plays a track to EOF through the
    NULL output and fires the next-track callback"""
    import io
    from audiotools_tpu.player import (AudioPlayer, NULLAudioOutput,
                                       PLAYER_STOPPED, PLAYER_PLAYING)
    from audiotools_tpu.formats.wav import WaveAudio
    from audiotools_tpu import pcm
    from audiotools_tpu.pcmstream import PCMReader

    arr = (np.arange(8820, dtype=np.int32) % 2001 - 1000).reshape(
        -1, 2)
    raw = pcm.FrameList._wrap(arr, 16).to_bytes(False, True)
    w = WaveAudio.from_pcm(str(tmp_path / "a.wav"),
                           PCMReader(io.BytesIO(raw), 44100, 2, 3, 16))
    done = []
    out = NULLAudioOutput()
    out.realtime = False            # no pacing in tests
    player = AudioPlayer(out, next_track_callback=lambda:
                         done.append(1))
    player.set_audiofile(w)
    player.play()
    assert player.state() == PLAYER_PLAYING
    guard = 0
    while player.state() == PLAYER_PLAYING and guard < 1000:
        player.output_audio()
        guard += 1
    assert player.state() == PLAYER_STOPPED
    assert done == [1]


def test_player_volume_and_replay_gain_api():
    from audiotools_tpu.player import (Player, NULLAudioOutput,
                                       RG_TRACK_GAIN)

    out = NULLAudioOutput()
    out.realtime = False
    player = Player(out)
    try:
        assert player.get_volume() == 1.0
        assert abs(player.change_volume(-0.25) - 0.75) < 1e-9
        player.set_volume(0.5)
        assert player.get_volume() == 0.5
        player.set_replay_gain(RG_TRACK_GAIN)   # accepted silently
        assert player.current_output_name() == "NULL"
    finally:
        player.close()


def test_audio_output_backends_registered():
    """all four reference sinks exist (src/output/{alsa,pulseaudio,
    core_audio}.c + OSS) plus NULL, each availability-gated; only
    usable ones surface through available_outputs()"""
    from audiotools_tpu import player

    names = [cls.NAME for cls in player.AUDIO_OUTPUT]
    assert names == ["CoreAudio", "PulseAudio", "ALSA", "OSS", "NULL"]
    for cls in player.AUDIO_OUTPUT:
        assert isinstance(cls.available(), bool)
    available = [cls.NAME for cls in player.available_outputs()]
    assert "NULL" in available
    # CoreAudio is darwin-only by definition
    import sys
    if sys.platform != "darwin":
        assert "CoreAudio" not in available
