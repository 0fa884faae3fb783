"""Seek support tests: FLAC (SEEKTABLE-driven), ALAC (stsz-driven),
raw PCM containers, and real seektable() computation."""

import io

import numpy as np

from audiotools_tpu import pcm
from audiotools_tpu.pcmstream import PCMReader

SR = 44100


def make_signal(n):
    t = np.arange(n)
    rng = np.random.default_rng(9)
    arr = np.stack([9000 * np.sin(2 * np.pi * 440 * t / SR) +
                    rng.normal(0, 300, n),
                    8000 * np.sin(2 * np.pi * 633 * t / SR)], axis=1)
    return np.clip(arr, -32768, 32767).astype(np.int32)


def make_reader(arr):
    fl = pcm.FrameList._wrap(arr, 16)
    return PCMReader(io.BytesIO(fl.to_bytes(False, True)),
                     SR, 2, 3, 16)


def read_n(reader, n):
    out = []
    got = 0
    while got < n:
        fl = reader.read(n - got)
        if fl.frames == 0:
            break
        out.append(fl.samples)
        got += fl.frames
    return np.concatenate(out)[:n] if out else np.zeros((0, 2),
                                                        np.int32)


def test_flac_seek_windows(tmp_path):
    from audiotools_tpu.formats.flac import FlacAudio
    n = SR * 10 + 1234
    arr = make_signal(n)
    path = str(tmp_path / "t.flac")
    af = FlacAudio.from_pcm(path, make_reader(arr), compression="5")
    assert af.seekable()

    for target in (0, 4096, SR * 3 + 17, n - 5000):
        dec = af.to_pcm()
        pos = dec.seek(target)
        assert pos <= target
        window = read_n(dec, 2000)
        dec.close()
        assert np.array_equal(window, arr[pos:pos + 2000]), target


def test_flac_seek_without_table(tmp_path):
    """files with no SEEKTABLE fall back to decoding from the start"""
    from audiotools_tpu.formats.flac import FlacAudio, Flac_SEEKTABLE
    n = SR * 3
    arr = make_signal(n)
    path = str(tmp_path / "t.flac")
    af = FlacAudio.from_pcm(path, make_reader(arr))
    metadata = af.get_metadata()
    metadata.replace_blocks(Flac_SEEKTABLE.BLOCK_ID, [])
    af.update_metadata(metadata)

    af2 = FlacAudio(path)
    dec = af2.to_pcm()
    pos = dec.seek(SR * 2)
    window = read_n(dec, 1000)
    dec.close()
    assert pos <= SR * 2
    assert np.array_equal(window, arr[pos:pos + 1000])


def test_flac_real_seektable(tmp_path):
    """seektable() computes true frame offsets by walking the file"""
    from audiotools_tpu.formats.flac import FlacAudio
    n = SR * 5
    arr = make_signal(n)
    path = str(tmp_path / "t.flac")
    af = FlacAudio.from_pcm(path, make_reader(arr))
    table = af.seektable(seekpoint_interval=SR)
    assert len(table.seekpoints) >= 4
    # every byte offset must point at a FLAC frame sync code
    with open(path, "rb") as f:
        data = f.read()
    frames_offset = data.index(b"\xff\xf8")
    for (sample_number, byte_offset, frame_count) in table.seekpoints:
        sync = data[frames_offset + byte_offset:
                    frames_offset + byte_offset + 2]
        assert sync[0] == 0xFF and (sync[1] & 0xF8) == 0xF8, \
            (sample_number, byte_offset)
        assert sample_number % 4096 == 0


def test_alac_seek(tmp_path):
    from audiotools_tpu.formats.m4a import ALACAudio
    from audiotools_tpu.codecs.alac_fast import FastALACDecoder
    n = SR * 6 + 200
    arr = make_signal(n)
    path = str(tmp_path / "t.m4a")
    af = ALACAudio.from_pcm(path, make_reader(arr))
    assert af.seekable()

    for target in (0, 8192, SR * 4 + 5, n - 3000):
        dec = FastALACDecoder(path)
        pos = dec.seek(target)
        assert pos <= target
        assert pos % 4096 == 0
        window = read_n(dec, 1500)
        dec.close()
        assert np.array_equal(window, arr[pos:pos + 1500]), target


def test_raw_pcm_seek(tmp_path):
    from audiotools_tpu.formats.wav import WaveAudio
    n = SR * 2
    arr = make_signal(n)
    path = str(tmp_path / "t.wav")
    af = WaveAudio.from_pcm(path, make_reader(arr))
    assert af.seekable()
    dec = af.to_pcm()
    pos = dec.seek(SR)
    assert pos == SR
    window = read_n(dec, 500)
    dec.close()
    assert np.array_equal(window, arr[SR:SR + 500])
