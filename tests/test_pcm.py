"""FrameList / FloatFrameList semantics tests.

Modeled on the reference's FrameList suite (test/test_core.py:1356,1856):
construction, (de)interleave, pack/unpack at 8/16/24-bit both endians,
signed/unsigned, split/concat, int<->float round-trips.
"""

import numpy as np
import pytest

from audiotools_tpu import pcm


def test_framelist_from_bytes_16le():
    # frames: (1, -1), (256, -256)
    data = (b"\x01\x00" + b"\xff\xff" + b"\x00\x01" + b"\x00\xff")
    fl = pcm.FrameList(data, 2, 16, False, True)
    assert fl.frames == 2
    assert fl.channels == 2
    assert fl.bits_per_sample == 16
    assert len(fl) == 4
    assert list(fl) == [1, -1, 256, -256]


def test_framelist_from_bytes_16be():
    data = b"\x00\x01\xff\xff\x01\x00\xff\x00"
    fl = pcm.FrameList(data, 2, 16, True, True)
    assert list(fl) == [1, -1, 256, -256]


def test_framelist_unsigned():
    # unsigned 8-bit: 128 is zero
    data = bytes([128, 129, 127, 0])
    fl = pcm.FrameList(data, 1, 8, False, False)
    assert list(fl) == [0, 1, -1, -128]


def test_framelist_24bit_roundtrip():
    values = [0, 1, -1, 2 ** 23 - 1, -(2 ** 23), 123456, -654321]
    fl = pcm.from_list(values + [0], 2, 24, True)
    for big_endian in (False, True):
        for signed in (False, True):
            data = fl.to_bytes(big_endian, signed)
            fl2 = pcm.FrameList(data, 2, 24, big_endian, signed)
            assert fl2 == fl, (big_endian, signed)


def test_framelist_8bit_roundtrip():
    values = list(range(-128, 128))
    fl = pcm.from_list(values, 2, 8, True)
    for big_endian in (False, True):
        for signed in (False, True):
            data = fl.to_bytes(big_endian, signed)
            assert pcm.FrameList(data, 2, 8, big_endian, signed) == fl


def test_frame_and_channel():
    fl = pcm.from_list([1, 2, 3, 4, 5, 6], 2, 16, True)
    assert fl.frames == 3
    assert list(fl.frame(1)) == [3, 4]
    assert list(fl.channel(0)) == [1, 3, 5]
    assert list(fl.channel(1)) == [2, 4, 6]
    assert fl.frame(0).channels == 2
    assert fl.channel(0).frames == 3


def test_split_and_concat():
    fl = pcm.from_list(list(range(10)), 1, 16, True)
    (head, tail) = fl.split(4)
    assert list(head) == [0, 1, 2, 3]
    assert list(tail) == [4, 5, 6, 7, 8, 9]
    assert head + tail == fl
    (head, tail) = fl.split(0)
    assert head.frames == 0
    assert tail == fl
    (head, tail) = fl.split(100)
    assert head == fl
    assert tail.frames == 0


def test_from_frames_from_channels():
    f1 = pcm.from_list([1, 2], 2, 16, True)
    f2 = pcm.from_list([3, 4], 2, 16, True)
    assert list(pcm.from_frames([f1, f2])) == [1, 2, 3, 4]

    c1 = pcm.from_list([1, 2, 3], 1, 16, True)
    c2 = pcm.from_list([4, 5, 6], 1, 16, True)
    assert list(pcm.from_channels([c1, c2])) == [1, 4, 2, 5, 3, 6]


def test_float_conversion():
    fl = pcm.from_list([0, 16384, -16384, 32767, -32768], 1, 16, True)
    ff = fl.to_float()
    assert ff[0] == 0.0
    assert ff[1] == 0.5
    assert ff[2] == -0.5
    assert ff[4] == -1.0
    back = ff.to_int(16)
    assert back == fl


def test_float_clipping():
    ff = pcm.FloatFrameList([1.5, -1.5, 0.25], 1)
    fl = ff.to_int(16)
    assert list(fl) == [32767, -32768, 8192]


def test_mul_repetition():
    fl = pcm.from_list([1, 2], 1, 16, True)
    assert list(fl * 3) == [1, 2, 1, 2, 1, 2]


def test_mismatched_concat_raises():
    a = pcm.from_list([1, 2], 2, 16, True)
    b = pcm.from_list([1], 1, 16, True)
    with pytest.raises(ValueError):
        a + b


def test_partial_frame_bytes_raises():
    with pytest.raises(ValueError):
        pcm.FrameList(b"\x00\x00\x00", 2, 16, False, True)


def test_empty_framelist():
    fl = pcm.empty_framelist(2, 16)
    assert len(fl) == 0
    assert fl.frames == 0
    assert fl.channels == 2


def test_frame_count():
    fl = pcm.from_list([0, 0], 2, 16, True)
    assert fl.frame_count(400) == 100
    assert fl.frame_count(1) == 1
