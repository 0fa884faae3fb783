"""PCMReader stream-algebra edge cases.

Extends tests/test_pcmstream.py toward the reference's coverage depth
(test/test_core.py:56-338 plus the ERROR_PCM_Reader error-injection
pattern from test/test_formats.py:60): error poisoning through
wrapper chains, RemaskedPCMReader mask arithmetic, Head/DeHead
boundary semantics, ChannelMask algebra on undefined masks, split
boundary conditions, and the threaded transfer helper.
"""

import io
import threading

import numpy as np
import pytest

from audiotools_tpu import pcm
from audiotools_tpu.pcmstream import (
    PCMReader, PCMCat, BufferedPCMReader, ReorderedPCMReader,
    RemaskedPCMReader, LimitedPCMReader, CounterPCMReader,
    PCMReaderWindow, PCMReaderHead, PCMReaderDeHead, PCMReaderError,
    PCMReaderProgress, ChannelMask, pcm_cmp, pcm_frame_cmp, pcm_split,
    threaded_transfer_framelist_data)


def make_reader(values, channels=1, bits=16, rate=44100):
    fl = pcm.from_list(list(values), channels, bits, True)
    return PCMReader(io.BytesIO(fl.to_bytes(False, True)),
                     rate, channels,
                     int(ChannelMask.from_channels(channels)), bits)


def read_all(reader, chunk=4096):
    out = []
    f = reader.read(chunk)
    while len(f) > 0:
        out.extend(list(f))
        f = reader.read(chunk)
    return out


# ---------------------------------------------------------- errors --

def test_error_reader_raises_with_message():
    r = PCMReaderError("boom", 44100, 2, 3, 16)
    with pytest.raises(ValueError, match="boom"):
        r.read(1000)


@pytest.mark.parametrize("wrap", [
    lambda r: BufferedPCMReader(r),
    lambda r: PCMCat([r]),
    lambda r: ReorderedPCMReader(r, [1, 0]),
    lambda r: LimitedPCMReader(BufferedPCMReader(r), 100),
    lambda r: CounterPCMReader(r),
    lambda r: PCMReaderWindow(r, 0, 100),
    lambda r: PCMReaderHead(r, 100),
    lambda r: PCMReaderDeHead(r, 10),
], ids=["buffered", "cat", "reordered", "limited", "counter",
        "window", "head", "dehead"])
def test_error_propagates_through_wrappers(wrap):
    """a failing source poisons any wrapper stack (reference
    ERROR_PCM_Reader semantics)"""
    inner = PCMReaderError("stream failed", 44100, 2, 3, 16)
    with pytest.raises(ValueError):
        read_all(wrap(inner))


# -------------------------------------------------------- remasked --

def test_remasked_reorders_by_mask():
    # stereo (FL, FR) -> (FR) via the FR-only mask
    r = make_reader([1, 2, 3, 4, 5, 6], channels=2)
    remasked = RemaskedPCMReader(r, 1, 0x2)
    assert read_all(remasked) == [2, 4, 6]


def test_remasked_pads_missing_channels_with_silence():
    # FL-only source -> stereo FL,FR: FR is silence
    fl = pcm.from_list([7, 8, 9], 1, 16, True)
    r = PCMReader(io.BytesIO(fl.to_bytes(False, True)),
                  44100, 1, 0x1, 16)
    remasked = RemaskedPCMReader(r, 2, 0x3)
    assert read_all(remasked) == [7, 0, 8, 0, 9, 0]


def test_remasked_disjoint_masks_silence():
    # mono FC source (default mask) shares nothing with FL/FR
    r = make_reader([7, 8], channels=1)
    remasked = RemaskedPCMReader(r, 2, 0x3)
    assert read_all(remasked) == [0, 0, 0, 0]


def test_remasked_mask_count_mismatch_raises():
    r = make_reader([0, 0], channels=2)
    with pytest.raises(ValueError):
        RemaskedPCMReader(r, 1, 0x3)    # 2-channel mask, count 1


def test_remasked_zero_mask_truncates_or_pads():
    r = make_reader([1, 2, 3, 4], channels=2)
    assert read_all(RemaskedPCMReader(r, 1, 0)) == [1, 3]
    r = make_reader([1, 2], channels=1)
    assert read_all(RemaskedPCMReader(r, 3, 0)) == [1, 0, 0, 2, 0, 0]


# ----------------------------------------------------- head/dehead --

def test_head_truncates():
    r = make_reader(range(10))
    assert read_all(PCMReaderHead(r, 4)) == [0, 1, 2, 3]


def test_head_zero_extends():
    r = make_reader([5, 6])
    assert read_all(PCMReaderHead(r, 5)) == [5, 6, 0, 0, 0]


def test_head_zero_frames():
    r = make_reader(range(10))
    assert read_all(PCMReaderHead(r, 0)) == []


def test_head_negative_raises():
    with pytest.raises(ValueError):
        PCMReaderHead(make_reader([1]), -1)


def test_dehead_skips_start():
    r = make_reader(range(10))
    assert read_all(PCMReaderDeHead(r, 3)) == list(range(3, 10))


def test_dehead_negative_pads_start():
    r = make_reader([1, 2, 3])
    assert read_all(PCMReaderDeHead(r, -2)) == [0, 0, 1, 2, 3]


def test_dehead_past_end_empty():
    r = make_reader([1, 2, 3])
    assert read_all(PCMReaderDeHead(r, 99)) == []


def test_window_offset_and_length_stereo():
    r = make_reader([1, 2, 3, 4, 5, 6, 7, 8], channels=2)
    # skip 1 frame, take 2
    assert read_all(PCMReaderWindow(r, 1, 2)) == [3, 4, 5, 6]


# -------------------------------------------------------- pcm_split --

def test_pcm_split_exact_lengths():
    r = make_reader(range(10))
    parts = [read_all(sub) for sub in pcm_split(r, [3, 3, 4])]
    assert parts == [[0, 1, 2], [3, 4, 5], [6, 7, 8, 9]]


def test_pcm_split_zero_length_segment():
    r = make_reader(range(4))
    parts = [read_all(sub) for sub in pcm_split(r, [0, 4])]
    assert parts == [[], [0, 1, 2, 3]]


def test_pcm_split_consumes_in_order():
    """segments must be consumed lazily in order; each is complete"""
    r = make_reader(range(6))
    gen = pcm_split(r, [2, 2, 2])
    first = next(gen)
    assert read_all(first) == [0, 1]
    second = next(gen)
    assert read_all(second) == [2, 3]


# ----------------------------------------------------- comparisons --

def test_pcm_frame_cmp_reports_first_mismatch_frame():
    a = make_reader([0, 0, 0, 9, 0], channels=1)
    b = make_reader([0, 0, 0, 8, 0], channels=1)
    assert pcm_frame_cmp(a, b) == 3


def test_pcm_frame_cmp_length_mismatch():
    # reference semantics (__init__.py:2471-2475): a pure length
    # mismatch inside one buffered read reports the last shared index
    a = make_reader([1, 2, 3])
    b = make_reader([1, 2])
    assert pcm_frame_cmp(a, b) == 1


def test_pcm_cmp_parameter_mismatch():
    a = make_reader([1, 2], channels=1)
    b = make_reader([1, 2], channels=2)
    assert not pcm_cmp(a, b)


# ----------------------------------------------------- channel mask --

def test_channel_mask_undefined():
    m = ChannelMask(0)
    assert not m.defined()
    assert len(m) == 0


def test_channel_mask_fields_roundtrip():
    m = ChannelMask.from_fields(front_left=True, front_right=True,
                                low_frequency=True)
    assert int(m) == 0x3 | 0x8
    assert m.front_left and m.front_right and m.low_frequency
    assert not m.front_center
    assert m.channels() == ["front_left", "front_right",
                            "low_frequency"]


def test_channel_mask_from_channels_standard():
    assert int(ChannelMask.from_channels(1)) == 0x4      # mono: FC
    assert int(ChannelMask.from_channels(2)) == 0x3      # stereo
    with pytest.raises(ValueError):
        ChannelMask.from_channels(3)


def test_channel_mask_index():
    m = ChannelMask(0x3F)     # 5.1
    assert m.index("front_left") == 0
    assert m.index("low_frequency") == 3


# ------------------------------------------------------- transfers --

def test_threaded_transfer_framelist_data():
    r = make_reader(range(1000))
    chunks = []
    lock = threading.Lock()

    def sink(data):
        with lock:
            chunks.append(data)

    threaded_transfer_framelist_data(r, sink)
    joined = b"".join(bytes(c) for c in chunks)
    fl = pcm.FrameList(joined, 1, 16, False, True)
    assert list(fl) == list(range(1000))


def test_progress_reader_reports_monotonic():
    calls = []
    r = PCMReaderProgress(make_reader(range(100)), 100,
                          lambda cur, tot: calls.append((cur, tot)))
    read_all(r, chunk=30)
    assert calls[-1] == (100, 100)
    assert all(c1 <= c2 for ((c1, _), (c2, _))
               in zip(calls, calls[1:]))


def test_counter_reader_counts_bytes():
    c = CounterPCMReader(make_reader(range(50), channels=1, bits=16))
    read_all(c)
    assert c.frames_written == 50
    assert c.bytes_written() == 100
