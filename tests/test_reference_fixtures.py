"""Interop tests against the reference's bundled fixture files —
real-world encoder output our decoders must accept (decode-only;
the files are read from the read-only reference checkout and
skipped when absent)."""

import hashlib
import os

import numpy as np
import pytest

from conftest import REFERENCE_DIR, reference_available

FIX = os.path.join(REFERENCE_DIR, "test")

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference fixtures absent")


def decode_all(track):
    reader = track.to_pcm()
    out = []
    fl = reader.read(1 << 20)
    while fl.frames:
        out.append(fl.samples)
        fl = reader.read(1 << 20)
    reader.close()
    return (np.concatenate(out) if out else
            np.zeros((0, track.channels()), dtype=np.int32))


def pcm_md5(samples, bps):
    from audiotools_tpu import pcm
    fl = pcm.FrameList._wrap(np.ascontiguousarray(samples), bps)
    return hashlib.md5(fl.to_bytes(False, bps > 8)).hexdigest()


@pytest.mark.parametrize("name", [
    "tone.flac", "tone1.flac", "tone2.flac", "tone3.flac",
    "tone4.flac", "tone5.flac", "tone6.flac", "tone7.flac",
    "tone8.flac", "flac-allframes.flac", "1s.flac",
])
def test_reference_flac_decodes(name):
    """reference-encoded FLAC files decode and verify (the embedded
    STREAMINFO MD5 is the ground truth for sample correctness)"""
    from audiotools_tpu.formats.flac import FlacAudio
    track = FlacAudio(os.path.join(FIX, name))
    # full-decode verify checks CRCs and the STREAMINFO MD5
    track.verify()
    samples = decode_all(track)
    assert samples.shape[0] == track.total_frames()
    assert samples.shape[1] == track.channels()


def test_reference_flac_md5_matches_streaminfo():
    from audiotools_tpu.formats.flac import FlacAudio
    from audiotools_tpu.formats.flac import Flac_STREAMINFO
    track = FlacAudio(os.path.join(FIX, "tone.flac"))
    info = track.get_metadata().get_block(Flac_STREAMINFO.BLOCK_ID)
    samples = decode_all(track)
    assert pcm_md5(samples, track.bits_per_sample()) == \
        info.md5sum.hex()


def test_reference_flac_id3_wrapped():
    """FLAC streams wrapped in ID3v2 tags open and decode
    (reference flac-id3.flac has both ID3v2 and ID3v1)"""
    from audiotools_tpu.formats.flac import FlacAudio
    for name in ("flac-id3.flac", "flac-id3-2.flac"):
        track = FlacAudio(os.path.join(FIX, name))
        samples = decode_all(track)
        assert samples.shape[0] == track.total_frames()


def test_reference_flac_seektable():
    from audiotools_tpu.formats.flac import FlacAudio, Flac_SEEKTABLE
    track = FlacAudio(os.path.join(FIX, "flac-seektable.flac"))
    meta = track.get_metadata()
    assert meta.has_block(Flac_SEEKTABLE.BLOCK_ID)
    reader = track.to_pcm()
    if hasattr(reader, "seek"):
        pos = reader.seek(track.total_frames() // 2)
        assert 0 <= pos <= track.total_frames() // 2
    reader.close()


def test_reference_shorten_decodes():
    """reference-encoded Shorten files (diff + LPC modes)"""
    from audiotools_tpu.formats.shn import ShortenAudio
    for name in ("shorten-frames.shn", "shorten-lpc.shn"):
        track = ShortenAudio(os.path.join(FIX, name))
        samples = decode_all(track)
        assert samples.shape[0] == track.total_frames(), name
        assert samples.shape[1] == track.channels(), name


def test_reference_wavpack_decodes():
    from audiotools_tpu.formats.wavpack import WavPackAudio
    for name in ("silence.wv", "wavpack-combo.wv"):
        track = WavPackAudio(os.path.join(FIX, name))
        samples = decode_all(track)
        assert samples.shape[0] == track.total_frames(), name


def test_reference_tta_decodes():
    from audiotools_tpu.formats.tta import TrueAudio
    for name in ("trueaudio.tta", "tta-id3-2.tta"):
        track = TrueAudio(os.path.join(FIX, name))
        samples = decode_all(track)
        assert samples.shape[0] == track.total_frames(), name


def test_reference_alac_decodes():
    from audiotools_tpu.formats.m4a import ALACAudio
    track = ALACAudio(os.path.join(FIX, "alac-allframes.m4a"))
    samples = decode_all(track)
    assert samples.shape[0] == track.total_frames()


def test_reference_mp3_decodes():
    from audiotools_tpu.formats.mp3 import MP3Audio, MP2Audio
    mp3 = MP3Audio(os.path.join(FIX, "sine.mp3"))
    assert decode_all(mp3).shape[0] > 0
    mp3.verify()
    mp2 = MP2Audio(os.path.join(FIX, "sine.mp2"))
    assert decode_all(mp2).shape[0] > 0


def test_reference_id3_tagged_mp3s():
    """ID3v1/v2.2/v2.3/v2.4-tagged MP3s parse their metadata"""
    from audiotools_tpu.formats.mp3 import MP3Audio
    for name in ("id3v1.mp3", "id3v22.mp3", "id3v23.mp3",
                 "id3v24.mp3"):
        track = MP3Audio(os.path.join(FIX, name))
        md = track.get_metadata()
        assert md is not None, name
        assert md.track_name is not None, name


def test_reference_wav_aiff_fixtures():
    """multichannel + misordered WAV/AIFF fixtures open correctly"""
    from audiotools_tpu.formats.wav import WaveAudio
    from audiotools_tpu.formats.aiff import AiffAudio
    w6 = WaveAudio(os.path.join(FIX, "wav-6ch.wav"))
    assert w6.channels() == 6
    assert decode_all(w6).shape[1] == 6
    w8 = WaveAudio(os.path.join(FIX, "wav-8bit.wav"))
    assert w8.bits_per_sample() == 8
    decode_all(w8)
    a6 = AiffAudio(os.path.join(FIX, "aiff-6ch.aiff"))
    assert a6.channels() == 6
    decode_all(a6)


def test_reference_cover_images_parse():
    from audiotools_tpu.meta.image import image_metrics
    for name in ("testcover.png", "bigpng.png"):
        with open(os.path.join(FIX, name), "rb") as f:
            data = f.read()
        m = image_metrics(data)
        assert m.width > 0 and m.height > 0, name
        assert m.mime_type == "image/png", name


def test_reference_flac_nonmd5_verifies():
    """a FLAC with a zero STREAMINFO MD5 still verifies (the MD5
    check is skipped when unset, reference flac.py semantics)"""
    from audiotools_tpu.formats.flac import FlacAudio
    track = FlacAudio(os.path.join(FIX, "flac-nonmd5.flac"))
    track.verify()
    assert decode_all(track).shape[0] == track.total_frames()


def test_reference_flac_disordered_clean(tmp_path):
    """flac-disordered.flac (misordered metadata blocks) decodes,
    and clean() produces a well-formed copy"""
    from audiotools_tpu.formats.flac import FlacAudio
    track = FlacAudio(os.path.join(FIX, "flac-disordered.flac"))
    samples = decode_all(track)
    fixed_path = str(tmp_path / "fixed.flac")
    track.clean(fixed_path)
    fixed = FlacAudio(fixed_path)
    assert np.array_equal(decode_all(fixed), samples)


def test_reference_aac_m4a_gated_like_reference():
    """AAC M4A files parse attributes via direct class use, but
    open() rejects them without the faac/faad binaries — the same
    gating as the reference (__init__.py:1489-1506)"""
    from audiotools_tpu.formats.m4a import M4AAudio
    from audiotools_tpu import open as aopen, UnsupportedFile
    path = os.path.join(FIX, "m4a-itunes.m4a")
    track = M4AAudio(path)
    assert track.channels() == 2
    assert track.sample_rate() == 44100
    assert not track.lossless()
    if not M4AAudio.available():
        with pytest.raises(UnsupportedFile):
            aopen(path)


def test_reference_misordered_wav():
    """wav-misordered.wav (odd chunk order) still decodes"""
    from audiotools_tpu.formats.wav import WaveAudio
    track = WaveAudio(os.path.join(FIX, "wav-misordered.wav"))
    assert decode_all(track).shape[0] == track.total_frames()


def test_reference_aiff_nossnd_rejected():
    """aiff-nossnd.aiff (no SSND chunk) raises InvalidAIFF"""
    from audiotools_tpu.formats.aiff import AiffAudio, InvalidAIFF
    with pytest.raises(InvalidAIFF):
        AiffAudio(os.path.join(FIX, "aiff-nossnd.aiff"))
