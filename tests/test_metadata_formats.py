"""Cross-format track metadata round trips: every tagging format
type accepts a full MetaData (incl. cover art where supported) via
set_metadata and returns it from a fresh open (the track-level half
of the reference's test_metadata.py conversion matrix)."""

import os

import numpy as np
import pytest

from audiotools_tpu import MetaData, Image, pcm
from audiotools_tpu.dispatch import TYPE_MAP

SR = 44100
N = SR // 2

# a tiny valid PNG (1x1 red pixel)
PNG = bytes.fromhex(
    "89504e470d0a1a0a0000000d49484452000000010000000108020000009077"
    "53de0000000c4944415408d763f8cfc000000301010018dd8db00000000049"
    "454e44ae426082")


def _reader():
    t = np.arange(N)
    sig = (6000 * np.sin(2 * np.pi * 441 * t / SR)).astype(np.int32)
    arr = np.stack([sig, sig >> 1], 1).astype(np.int32)

    class Raw:
        sample_rate = SR
        channels = 2
        channel_mask = 3
        bits_per_sample = 16

        def __init__(self):
            self.pos = 0

        def read(self, frames):
            chunk = arr[self.pos:self.pos + frames]
            self.pos += len(chunk)
            return pcm.FrameList._wrap(
                np.ascontiguousarray(chunk), 16)

        def close(self):
            pass

    return Raw()


def full_metadata():
    return MetaData(track_name="Tést Track",
                    track_number=3,
                    track_total=12,
                    album_name="Album – Name",
                    artist_name="Artist",
                    performer_name="Performer",
                    composer_name="Composer",
                    conductor_name="Conductor",
                    ISRC="USABC1234567",
                    catalog="CAT-001",
                    copyright="2026 Someone",
                    publisher="Label",
                    year="2026",
                    date="2026-08-16",
                    album_number=1,
                    album_total=2,
                    comment="a comment")


from audiotools_tpu.audiofile import AudioFile

TAGGING_TYPES = [
    name for (name, cls) in sorted(TYPE_MAP.items())
    if cls.set_metadata is not AudioFile.set_metadata
    and name not in ("wav", "aiff", "au", "shn")]


@pytest.mark.parametrize("name", TAGGING_TYPES)
def test_metadata_roundtrip(tmp_path, name):
    cls = TYPE_MAP[name]
    path = str(tmp_path / ("t." + cls.SUFFIX))
    track = cls.from_pcm(path, _reader())
    md = full_metadata()
    track.set_metadata(md)

    got = type(track)(path).get_metadata()
    assert got is not None, name
    for field in ("track_name", "album_name", "artist_name",
                  "track_number"):
        assert getattr(got, field) == getattr(md, field), \
            (name, field, getattr(got, field))
    # at least one of year/date survives in every format
    assert (got.year == md.year) or (got.date == md.date), name


IMAGE_TYPES = [n for n in ("flac", "oggflac", "alac", "mp3",
                           "mp2", "tta", "wavpack")
               if n in TAGGING_TYPES]


@pytest.mark.parametrize("name", IMAGE_TYPES)
def test_cover_art_roundtrip(tmp_path, name):
    cls = TYPE_MAP[name]
    path = str(tmp_path / ("t." + cls.SUFFIX))
    track = cls.from_pcm(path, _reader())
    md = full_metadata()
    md.add_image(Image.new(PNG, "front cover", 0))
    track.set_metadata(md)

    got = type(track)(path).get_metadata()
    images = got.images()
    assert len(images) == 1, name
    assert images[0].data == PNG, name


def test_delete_metadata(tmp_path):
    from audiotools_tpu.formats.flac import FlacAudio
    path = str(tmp_path / "t.flac")
    track = FlacAudio.from_pcm(path, _reader())
    track.set_metadata(full_metadata())
    track = FlacAudio(path)
    track.delete_metadata()
    got = FlacAudio(path).get_metadata()
    assert got is None or got.track_name is None


def test_aiff_foreign_chunk_passthrough(tmp_path):
    """AIFF -> FLAC -> AIFF preserves foreign chunks byte-for-byte
    (reference test_formats.py:1683 mixin)"""
    from audiotools_tpu.formats.aiff import AiffAudio
    from audiotools_tpu.formats.flac import FlacAudio

    src = str(tmp_path / "src.aiff")
    AiffAudio.from_pcm(src, _reader())
    # append a foreign ANNO chunk and patch the FORM size
    with open(src, "rb") as f:
        data = bytearray(f.read())
    foreign = b"ANNO" + (8).to_bytes(4, "big") + b"hithere!"
    data += foreign
    form_size = int.from_bytes(data[4:8], "big") + len(foreign)
    data[4:8] = form_size.to_bytes(4, "big")
    with open(src, "wb") as f:
        f.write(bytes(data))

    a = AiffAudio(src)
    assert a.has_foreign_aiff_chunks()

    mid = str(tmp_path / "mid.flac")
    f1 = a.convert(mid, FlacAudio)
    assert f1.has_foreign_aiff_chunks()

    back = str(tmp_path / "back.aiff")
    f1.convert(back, AiffAudio)
    with open(back, "rb") as f:
        assert f.read() == bytes(data)


def test_wav_foreign_chunk_passthrough_via_flac(tmp_path):
    """WAV -> FLAC -> WAV preserves foreign chunks byte-for-byte
    via APPLICATION metadata blocks (reference flac.py:1890-2120)"""
    from audiotools_tpu.formats.wav import WaveAudio
    from audiotools_tpu.formats.flac import FlacAudio

    src = str(tmp_path / "src.wav")
    WaveAudio.from_pcm(src, _reader())
    with open(src, "rb") as f:
        data = bytearray(f.read())
    foreign = (b"LIST" + (12).to_bytes(4, "little") +
               b"INFOIART" + (0).to_bytes(4, "little"))
    data += foreign
    riff_size = int.from_bytes(data[4:8], "little") + len(foreign)
    data[4:8] = riff_size.to_bytes(4, "little")
    with open(src, "wb") as f:
        f.write(bytes(data))

    w = WaveAudio(src)
    assert w.has_foreign_wave_chunks()

    mid = str(tmp_path / "mid.flac")
    f1 = w.convert(mid, FlacAudio)
    assert f1.has_foreign_wave_chunks()
    assert not f1.has_foreign_aiff_chunks()

    back = str(tmp_path / "back.wav")
    f1.convert(back, WaveAudio)
    with open(back, "rb") as f:
        assert f.read() == bytes(data)

    # and FLAC -> FLAC keeps the blocks through a pure-PCM convert?
    # (no: a PCM convert drops them, like the reference; the chunks
    # belong to the container path only)
    plain = str(tmp_path / "plain.flac")
    FlacAudio(mid).convert(plain, FlacAudio)
