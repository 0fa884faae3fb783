"""More interop coverage over the reference's bundled fixtures.

Extends tests/test_reference_fixtures.py with the fixture families it
left out: duration-metadata cases (1m/1h), channel-mask-less FLAC
(flac-nomask1-4), the AIFF/WAV channel/bit-depth ladder, TTA with a
stacked ID3 tag, the WavPack feature-combo file, and the oversized
PNG cover image.
"""

import os

import numpy as np
import pytest

from conftest import REFERENCE_DIR, reference_available
from test_reference_fixtures import decode_all

FIX = os.path.join(REFERENCE_DIR, "test")

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference fixtures absent")


def test_duration_metadata_1m_1h():
    """1m/1h fixtures: header-level duration without full decode"""
    from audiotools_tpu.formats.flac import FlacAudio
    one_minute = FlacAudio(os.path.join(FIX, "1m.flac"))
    assert one_minute.seconds_length() == 60
    one_hour = FlacAudio(os.path.join(FIX, "1h.flac"))
    assert one_hour.seconds_length() == 3600
    assert one_hour.sample_rate() > 0


@pytest.mark.parametrize("name", ["flac-nomask1.flac",
                                  "flac-nomask2.flac",
                                  "flac-nomask3.flac",
                                  "flac-nomask4.flac"])
def test_flac_without_channel_mask(name):
    """mask-less multichannel FLAC still opens, reports a usable
    channel count, and decode-verifies"""
    from audiotools_tpu.formats.flac import FlacAudio
    track = FlacAudio(os.path.join(FIX, name))
    assert track.channels() >= 1
    assert track.verify()
    samples = decode_all(track)
    assert samples.shape[1] == track.channels()
    assert samples.shape[0] == track.total_frames()


@pytest.mark.parametrize("name,channels,bps", [
    ("aiff-1ch.aiff", 1, 16),
    ("aiff-2ch.aiff", 2, 16),
    ("aiff-8bit.aiff", 1, 8),
    ("wav-1ch.wav", 1, 16),
    ("wav-2ch.wav", 2, 16),
    ("wav-8bit.wav", 1, 8),
    ("wav-6ch.wav", 6, 16),
])
def test_pcm_container_ladder(name, channels, bps):
    from audiotools_tpu.dispatch import open as at_open
    track = at_open(os.path.join(FIX, name))
    assert track.channels() == channels
    assert track.bits_per_sample() == bps
    samples = decode_all(track)
    assert samples.shape == (track.total_frames(), channels)


def test_aiff_metadata_fixture():
    from audiotools_tpu.formats.aiff import AiffAudio
    track = AiffAudio(os.path.join(FIX, "aiff-metadata.aiff"))
    samples = decode_all(track)
    assert samples.shape[0] == track.total_frames()


def test_trueaudio_fixture_decodes():
    from audiotools_tpu.formats.tta import TrueAudio
    track = TrueAudio(os.path.join(FIX, "trueaudio.tta"))
    samples = decode_all(track)
    assert samples.shape[0] == track.total_frames()
    assert track.verify()


def test_tta_with_stacked_id3():
    """tta-id3-2.tta carries ID3 tags around the TTA stream"""
    from audiotools_tpu.dispatch import open as at_open
    track = at_open(os.path.join(FIX, "tta-id3-2.tta"))
    samples = decode_all(track)
    assert samples.shape[0] == track.total_frames()


def test_wavpack_combo_decodes():
    from audiotools_tpu.formats.wavpack import WavPackAudio
    track = WavPackAudio(os.path.join(FIX, "wavpack-combo.wv"))
    samples = decode_all(track)
    assert samples.shape[0] == track.total_frames()
    assert track.verify()


def test_big_png_metrics():
    from audiotools_tpu.meta.image import image_metrics
    data = open(os.path.join(FIX, "bigpng.png"), "rb").read()
    m = image_metrics(data)
    assert m.mime_type == u"image/png"
    assert m.width > 0 and m.height > 0


def test_mp3_with_id3v1_and_v2():
    """id3-2.mp3: both tag generations stacked on one file"""
    from audiotools_tpu.formats.mp3 import MP3Audio
    if not MP3Audio.available(None):
        pytest.skip("libmpg123 absent")
    track = MP3Audio(os.path.join(FIX, "id3-2.mp3"))
    md = track.get_metadata()
    assert md is not None
