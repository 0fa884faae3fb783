"""Lossy format (MP3/MP2/Vorbis/Opus) + Ogg container + OggFLAC tests.

Formats gated on system libraries skip cleanly when absent, mirroring
the reference's test.cfg feature switches."""

import io
import os

import numpy as np
import pytest

from audiotools_tpu import pcm
from audiotools_tpu.pcmstream import PCMReader
from audiotools_tpu.audiofile import MetaData

SR = 44100


def make_signal(n=SR * 2 + 333):
    t = np.arange(n)
    rng = np.random.default_rng(1)
    arr = np.stack([9000 * np.sin(2 * np.pi * 440 * t / SR) +
                    rng.normal(0, 200, n),
                    8000 * np.sin(2 * np.pi * 633 * t / SR)], axis=1)
    return np.clip(arr, -32768, 32767).astype(np.int32)


def make_reader(arr):
    fl = pcm.FrameList._wrap(arr, 16)
    return PCMReader(io.BytesIO(fl.to_bytes(False, True)),
                     SR, 2, 3, 16)


def decode_all(reader):
    out = []
    fl = reader.read(65536)
    while fl.frames:
        out.append(fl.samples)
        fl = reader.read(65536)
    reader.close()
    return np.concatenate(out) if out else np.zeros((0, 2), np.int32)


# ---- Ogg container ------------------------------------------------------

def test_ogg_page_roundtrip():
    from audiotools_tpu.ogg import Page, PageReader, PageWriter
    buf = io.BytesIO()
    w = PageWriter(buf)
    page = Page(False, True, False, 12345, 777, 0,
                [b"hello", b"world" * 40])
    w.write(page)
    buf.seek(0)
    got = PageReader(buf).read()
    assert got.segments == page.segments
    assert got.granule_position == 12345
    assert got.bitstream_serial_number == 777
    assert got.stream_beginning


def test_ogg_packet_assembly():
    from audiotools_tpu.ogg import (Page, PageReader, PageWriter,
                                    PacketReader, packets_to_pages)
    packets = [b"a" * 255, b"b" * 1000, b"", b"c" * 10]
    buf = io.BytesIO()
    w = PageWriter(buf)
    for page in packets_to_pages(packets, 5, 0):
        w.write(page)
    buf.seek(0)
    reader = PacketReader(PageReader(buf))
    for expected in packets:
        assert reader.read_packet() == expected


def test_ogg_crc_detects_corruption():
    from audiotools_tpu.ogg import Page
    data = bytearray(Page(False, False, False, 0, 1, 0,
                          [b"payload"]).build())
    data[-1] ^= 0xFF
    with pytest.raises(ValueError):
        Page.parse(bytes(data))


# ---- OggFLAC -------------------------------------------------------------

def test_oggflac_roundtrip(tmp_path):
    from audiotools_tpu.formats.flac import OggFlacAudio
    arr = make_signal()
    path = str(tmp_path / "t.oga")
    af = OggFlacAudio.from_pcm(path, make_reader(arr))
    assert af.total_frames() == len(arr)
    assert np.array_equal(decode_all(af.to_pcm()), arr)
    assert af.verify()
    af.set_metadata(MetaData(track_name="X", track_number=7))
    af2 = OggFlacAudio(path)
    md = af2.get_metadata()
    assert md.track_name == "X"
    assert md.track_number == 7
    assert np.array_equal(decode_all(af2.to_pcm()), arr)


# ---- MPEG verify (native walker) -----------------------------------------

def _mp3_available():
    from audiotools_tpu.formats.mp3 import MP3Audio
    return MP3Audio.available()


@pytest.mark.skipif(not _mp3_available(), reason="libmp3lame absent")
def test_mp3_roundtrip(tmp_path):
    from audiotools_tpu.formats.mp3 import MP3Audio
    arr = make_signal()
    path = str(tmp_path / "t.mp3")
    af = MP3Audio.from_pcm(path, make_reader(arr))
    assert not af.lossless()
    assert af.sample_rate() == SR
    assert af.channels() == 2
    assert af.verify()
    decoded = decode_all(af.to_pcm())
    assert abs(decoded.shape[0] - len(arr)) < 5000   # codec delay
    af.set_metadata(MetaData(track_name="M", track_number=1,
                             artist_name="A"))
    af2 = MP3Audio(path)
    md = af2.get_metadata()
    assert md.track_name == "M"
    assert md.track_number == 1
    assert af2.verify()


@pytest.mark.skipif(not _mp3_available(), reason="libmp3lame absent")
def test_mp3_verify_catches_truncation(tmp_path):
    from audiotools_tpu.formats.mp3 import MP3Audio
    from audiotools_tpu import InvalidFile
    arr = make_signal()
    path = str(tmp_path / "t.mp3")
    MP3Audio.from_pcm(path, make_reader(arr))
    data = open(path, "rb").read()
    open(path, "wb").write(data[:len(data) // 2 + 7])
    with pytest.raises(InvalidFile):
        MP3Audio(path).verify()


def _mp2_available():
    from audiotools_tpu.formats.mp3 import MP2Audio
    return MP2Audio.available()


@pytest.mark.skipif(not _mp2_available(), reason="libtwolame absent")
def test_mp2_roundtrip(tmp_path):
    from audiotools_tpu.formats.mp3 import MP2Audio
    arr = make_signal()
    path = str(tmp_path / "t.mp2")
    af = MP2Audio.from_pcm(path, make_reader(arr))
    assert af.verify()
    decoded = decode_all(af.to_pcm())
    assert abs(decoded.shape[0] - len(arr)) < 5000


# ---- Vorbis ---------------------------------------------------------------

def _vorbis_available():
    from audiotools_tpu.formats.vorbis import VorbisAudio
    return VorbisAudio.available()


@pytest.mark.skipif(not _vorbis_available(), reason="libvorbis absent")
def test_vorbis_roundtrip(tmp_path):
    from audiotools_tpu.formats.vorbis import VorbisAudio
    arr = make_signal()
    path = str(tmp_path / "t.ogg")
    af = VorbisAudio.from_pcm(path, make_reader(arr))
    assert af.total_frames() == len(arr)
    assert af.verify()
    decoded = decode_all(af.to_pcm())
    assert decoded.shape[0] == len(arr)
    af.set_metadata(MetaData(track_name="V", track_number=3))
    af2 = VorbisAudio(path)
    md = af2.get_metadata()
    assert md.track_name == "V"
    assert md.track_number == 3
    assert decode_all(af2.to_pcm()).shape[0] == len(arr)


def _opus_available():
    from audiotools_tpu.formats.opus import OpusAudio
    return OpusAudio.available()


@pytest.mark.skipif(not _opus_available(), reason="libopus absent")
def test_opus_roundtrip(tmp_path):
    from audiotools_tpu.formats.opus import OpusAudio
    arr = make_signal()
    path = str(tmp_path / "t.opus")
    af = OpusAudio.from_pcm(path, make_reader(arr))
    expected = int(round(len(arr) * 48000 / SR))
    assert abs(af.total_frames() - expected) <= 2
    assert af.verify()
    decoded = decode_all(af.to_pcm())
    assert decoded.shape[0] == af.total_frames()
    af.set_metadata(MetaData(track_name="O", track_number=9))
    af2 = OpusAudio(path)
    md = af2.get_metadata()
    assert md.track_name == "O"
    assert md.track_number == 9


# ---- dispatch sniffing ----------------------------------------------------

def test_file_type_sniffing(tmp_path):
    from audiotools_tpu.dispatch import file_type, open as at_open
    from audiotools_tpu.formats.flac import OggFlacAudio
    arr = make_signal(SR // 2)
    path = str(tmp_path / "t.oga")
    OggFlacAudio.from_pcm(path, make_reader(arr))
    with open(path, "rb") as f:
        assert file_type(f) is OggFlacAudio
    af = at_open(path)
    assert isinstance(af, OggFlacAudio)
