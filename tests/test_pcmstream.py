"""PCMReader stream algebra tests.

Modeled on the reference wrapper tests (test/test_core.py:56-338):
BufferedPCMReader exact-count reads, PCMCat, ReorderedPCMReader,
LimitedPCMReader, PCMReaderWindow offsets, pcm_cmp / pcm_frame_cmp,
pcm_split, ChannelMask algebra.
"""

import io

import pytest

from audiotools_tpu import pcm
from audiotools_tpu.pcmstream import (PCMReader, PCMCat, BufferedPCMReader,
                                      ReorderedPCMReader, LimitedPCMReader,
                                      CounterPCMReader, PCMReaderWindow,
                                      ChannelMask, pcm_cmp, pcm_frame_cmp,
                                      pcm_split)


def make_reader(values, channels=1, bits_per_sample=16, sample_rate=44100):
    fl = pcm.from_list(values, channels, bits_per_sample, True)
    return PCMReader(io.BytesIO(fl.to_bytes(False, True)),
                     sample_rate, channels,
                     int(ChannelMask.from_channels(channels)),
                     bits_per_sample)


def read_all(reader):
    out = []
    f = reader.read(4096)
    while len(f) > 0:
        out.extend(list(f))
        f = reader.read(4096)
    return out


def test_pcmreader_basic():
    r = make_reader([1, 2, 3, 4, 5, 6], channels=2)
    f = r.read(2)
    assert f.frames == 2
    assert list(f) == [1, 2, 3, 4]
    assert list(r.read(10)) == [5, 6]
    assert r.read(10).frames == 0


def test_buffered_reader_exact_counts():
    r = BufferedPCMReader(make_reader(list(range(100))))
    assert r.read(7).frames == 7
    assert r.read(90).frames == 90
    assert r.read(10).frames == 3
    assert r.read(10).frames == 0


def test_pcmcat():
    readers = [make_reader([1, 2]), make_reader([]), make_reader([3])]
    cat = PCMCat(readers)
    assert read_all(cat) == [1, 2, 3]


def test_pcmcat_mismatch():
    with pytest.raises(ValueError):
        PCMCat([make_reader([1]), make_reader([2], bits_per_sample=24)])


def test_reordered():
    r = ReorderedPCMReader(make_reader([1, 2, 3, 4], channels=2), [1, 0])
    assert read_all(r) == [2, 1, 4, 3]


def test_limited():
    r = LimitedPCMReader(BufferedPCMReader(make_reader(list(range(10)))), 4)
    assert read_all(r) == [0, 1, 2, 3]


def test_counter():
    c = CounterPCMReader(make_reader(list(range(6)), channels=2))
    read_all(c)
    assert c.frames_written == 3
    assert c.bytes_written() == 12


def test_window_positive_offset():
    r = PCMReaderWindow(make_reader(list(range(10))), 2, 5)
    assert read_all(r) == [2, 3, 4, 5, 6]


def test_window_negative_offset():
    r = PCMReaderWindow(make_reader([5, 6, 7]), -2, 5)
    assert read_all(r) == [0, 0, 5, 6, 7]


def test_window_pads_end():
    r = PCMReaderWindow(make_reader([1, 2]), 0, 4)
    assert read_all(r) == [1, 2, 0, 0]


def test_pcm_cmp_and_frame_cmp():
    assert pcm_cmp(make_reader([1, 2, 3]), make_reader([1, 2, 3]))
    assert not pcm_cmp(make_reader([1, 2, 3]), make_reader([1, 2, 4]))
    assert pcm_frame_cmp(make_reader([1, 2, 3]),
                         make_reader([1, 2, 3])) is None
    assert pcm_frame_cmp(make_reader([1, 2, 3]),
                         make_reader([1, 9, 3])) == 1
    # length mismatch: reference quirk returns min_frames - 1
    # (reference __init__.py:2471-2475 loop-else)
    assert pcm_frame_cmp(make_reader([1, 2, 3]),
                         make_reader([1, 2])) == 1
    # attribute mismatch
    assert pcm_frame_cmp(make_reader([1]),
                         make_reader([1], bits_per_sample=24)) == 0


def test_pcm_split():
    segments = [list(read_all(r))
                for r in pcm_split(make_reader(list(range(10))), [3, 4, 3])]
    assert segments == [[0, 1, 2], [3, 4, 5, 6], [7, 8, 9]]


def test_channel_mask():
    mask = ChannelMask(0x3)
    assert len(mask) == 2
    assert mask.defined()
    assert mask.channels() == ["front_left", "front_right"]
    assert int(mask) == 3
    assert mask == 0x3
    assert ChannelMask.from_fields(front_left=True,
                                   low_frequency=True) == 0x9
    assert ChannelMask(0xB).index("low_frequency") == 2
    assert ChannelMask.from_channels(1) == 0x4
    assert ChannelMask.from_channels(2) == 0x3
    with pytest.raises(ValueError):
        ChannelMask.from_channels(6)
    assert ChannelMask(0).undefined()
