"""WavPack codec and format tests.

Modeled on the reference WavPack suite (test_formats.py:5548
WavPackFileTest, :6134 test_python_codec): fixture decoding with
CRC/MD5 verification, roundtrips across all correlation pass counts,
ApeTag metadata, and wave header recovery.
"""

import io
import os
import tempfile

import numpy as np
import pytest

import audiotools_tpu as at
from audiotools_tpu import pcm
from audiotools_tpu.pcmstream import PCMReader
from audiotools_tpu.ref.wavpack import (encode_wavpack, WavPackDecoder,
                                        wv_log2, wv_exp2, store_weight,
                                        restore_weight)

from conftest import reference_available

REF_TEST = "/root/reference/test"


def make_reader(arr, sr=44100, bps=16):
    arr = np.asarray(arr, dtype=np.int32)
    if arr.ndim == 1:
        arr = arr.reshape(-1, 1)
    fl = pcm.FrameList._wrap(arr, bps)
    mask = {1: 4, 2: 3, 6: 0x3F}.get(arr.shape[1], 0)
    return PCMReader(io.BytesIO(fl.to_bytes(False, True)),
                     sr, arr.shape[1], mask, bps)


def decode_all(reader):
    out = []
    f = reader.read(1 << 17)
    while len(f) > 0:
        out.append(f.samples)
        f = reader.read(1 << 17)
    reader.read(1 << 17)   # trigger trailing-block MD5 verification
    return (np.concatenate(out, axis=0) if out
            else np.zeros((0, 1), dtype=np.int32))


def sines(n, ch=2):
    t = np.arange(n)
    return np.stack([(8000 * np.sin(t * 0.011 * (c + 1))).astype(
        np.int32) for c in range(ch)], axis=1)


@pytest.mark.skipif(not reference_available(), reason="no fixtures")
@pytest.mark.parametrize("fixture", ["silence.wv", "wavpack-combo.wv"])
def test_decode_fixtures(fixture):
    from audiotools_tpu.formats.wavpack import WavPackAudio
    w = WavPackAudio(os.path.join(REF_TEST, fixture))
    decoded = decode_all(w.to_pcm())
    assert decoded.shape[0] == w.total_frames()


@pytest.mark.parametrize("passes", [0, 1, 2, 5, 10, 16])
def test_roundtrip_passes(passes):
    arr = sines(9000)
    buf = io.BytesIO()
    encode_wavpack(buf, make_reader(arr), block_size=4096,
                   correlation_passes=passes)
    buf.seek(0)
    assert np.array_equal(decode_all(WavPackDecoder(buf)), arr)


@pytest.mark.parametrize("signal", ["silence", "false_stereo",
                                    "wasted", "mono", "6ch"])
def test_roundtrip_signals(signal):
    if signal == "silence":
        arr = np.zeros((5000, 2), dtype=np.int32)
    elif signal == "false_stereo":
        arr = np.stack([sines(5000, 1)[:, 0]] * 2, axis=1)
    elif signal == "wasted":
        arr = sines(5000) & ~15
    elif signal == "mono":
        arr = sines(5000, 1)
    else:
        arr = sines(4000, 6)
    buf = io.BytesIO()
    encode_wavpack(buf, make_reader(arr), block_size=4096,
                   correlation_passes=5)
    buf.seek(0)
    assert np.array_equal(decode_all(WavPackDecoder(buf)), arr)


def test_wv_log_exp_helpers():
    for v in [0, 1, 2, 100, 255, 256, 1000, 32767, 100000,
              -1, -100, -32768]:
        log = wv_log2(v)
        assert -32768 <= log <= 32767
        # the round trip is lossy but monotone and sign-preserving
        back = wv_exp2(log)
        if v > 0:
            assert back >= 0
        elif v < 0:
            assert back <= 0
    for w in range(-1024, 1025, 7):
        assert store_weight(restore_weight(store_weight(w))) == \
            store_weight(w)


def test_wavpack_format_class():
    from audiotools_tpu.formats.wavpack import WavPackAudio
    arr = sines(8000)
    tmp = tempfile.mktemp(suffix=".wv")
    try:
        w = WavPackAudio.from_pcm(tmp, make_reader(arr), "standard",
                                  total_pcm_frames=8000)
        assert at.pcm_cmp(make_reader(arr), w.to_pcm())
        assert type(at.open(tmp)) is WavPackAudio
        assert w.total_frames() == 8000
        assert w.lossless()

        w.set_metadata(at.MetaData(track_name="T", track_number=9))
        got = at.open(tmp).get_metadata()
        assert got.track_name == "T"
        assert got.track_number == 9
        assert at.pcm_cmp(make_reader(arr), at.open(tmp).to_pcm())

        (header, footer) = w.wave_header_footer()
        assert header[0:4] == b"RIFF"
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def test_wavpack_from_wave_passthrough():
    from audiotools_tpu.formats.wavpack import WavPackAudio
    from audiotools_tpu.formats.wav import WaveAudio
    arr = sines(6000)
    src = tempfile.mktemp(suffix=".wav")
    dst = tempfile.mktemp(suffix=".wv")
    back = tempfile.mktemp(suffix=".wav")
    try:
        wav = WaveAudio.from_pcm(src, make_reader(arr))
        wv = wav.convert(dst, WavPackAudio, "fast")
        assert at.pcm_cmp(wav.to_pcm(), wv.to_pcm())
        wav2 = wv.convert(back, WaveAudio)
        assert at.pcm_cmp(wav.to_pcm(), wav2.to_pcm())
    finally:
        for p in (src, dst, back):
            if os.path.exists(p):
                os.unlink(p)
