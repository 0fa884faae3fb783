"""Bitstream engine tests.

Modeled on the reference's exhaustive bitstream suite
(test/test_core.py:2029): the classic 4-byte fixture 0xB1 0xED 0x3B 0xC1
read/written both endians, unary, signed, bytes, parse/build round-trips,
callbacks, marks, recorders and accumulators.
"""

import io

import pytest

from audiotools_tpu.bitstream import (BitstreamReader, BitstreamWriter,
                                      BitstreamRecorder,
                                      BitstreamAccumulator, HuffmanTree,
                                      format_size)

# the reference test fixture bytes (test/test_core.py bitstream suite)
DATA = b"\xB1\xED\x3B\xC1"


def test_read_big_endian():
    r = BitstreamReader(DATA, False)
    assert r.read(2) == 2
    assert r.read(3) == 6
    assert r.read(5) == 7
    assert r.read(3) == 5
    assert r.read(19) == 0x53BC1


def test_read_little_endian():
    r = BitstreamReader(DATA, True)
    assert r.read(2) == 1
    assert r.read(3) == 4
    assert r.read(5) == 13
    assert r.read(3) == 3
    assert r.read(19) == 0x609DF


def test_read_signed_be():
    r = BitstreamReader(DATA, False)
    assert r.read_signed(2) == -2
    assert r.read_signed(3) == -2
    assert r.read_signed(5) == 7
    assert r.read_signed(3) == -3
    assert r.read_signed(19) == -181311


def test_unary_be():
    r = BitstreamReader(DATA, False)
    assert r.unary(0) == 1
    assert r.unary(0) == 2
    assert r.unary(0) == 0
    assert r.unary(0) == 0
    assert r.unary(0) == 4
    r = BitstreamReader(DATA, False)
    assert r.unary(1) == 0
    assert r.unary(1) == 1
    assert r.unary(1) == 0
    assert r.unary(1) == 3


def test_unary_le():
    r = BitstreamReader(DATA, True)
    assert r.unary(0) == 1
    assert r.unary(0) == 0
    assert r.unary(0) == 0
    assert r.unary(0) == 2
    assert r.unary(0) == 2
    r = BitstreamReader(DATA, True)
    assert r.unary(1) == 0
    assert r.unary(1) == 3
    assert r.unary(1) == 0
    assert r.unary(1) == 1


def test_write_read_roundtrip_be():
    f = io.BytesIO()
    w = BitstreamWriter(f, False)
    w.write(2, 2)
    w.write(3, 6)
    w.write(5, 7)
    w.write(3, 5)
    w.write(19, 0x53BC1)
    w.flush()
    assert f.getvalue() == DATA


def test_write_read_roundtrip_le():
    f = io.BytesIO()
    w = BitstreamWriter(f, True)
    w.write(2, 1)
    w.write(3, 4)
    w.write(5, 13)
    w.write(3, 3)
    w.write(19, 0x609DF)
    w.flush()
    assert f.getvalue() == DATA


def test_write_unary_roundtrip():
    for little_endian in (False, True):
        for stop_bit in (0, 1):
            f = io.BytesIO()
            w = BitstreamWriter(f, little_endian)
            values = [0, 1, 5, 40, 0, 2, 7, 100]
            for v in values:
                w.unary(stop_bit, v)
            w.byte_align()
            w.flush()
            r = BitstreamReader(f.getvalue(), little_endian)
            for v in values:
                assert r.unary(stop_bit) == v, \
                    (little_endian, stop_bit, v)


def test_write_signed_roundtrip():
    for little_endian in (False, True):
        f = io.BytesIO()
        w = BitstreamWriter(f, little_endian)
        values = [(5, -16), (5, 15), (8, -128), (17, -1),
                  (2, -2), (2, 1), (31, -2**30), (31, 2**30 - 1)]
        for (bits, v) in values:
            w.write_signed(bits, v)
        w.byte_align()
        w.flush()
        r = BitstreamReader(f.getvalue(), little_endian)
        for (bits, v) in values:
            assert r.read_signed(bits) == v, (little_endian, bits, v)


def test_parse_build_roundtrip():
    fmt = "2u 3u 5u 3s 19u 1p 4u a 2b"
    values = [2, 6, 7, -3, 1000, 12, b"hi"]
    f = io.BytesIO()
    w = BitstreamWriter(f, False)
    w.build(fmt, values)
    w.byte_align()
    w.flush()
    r = BitstreamReader(f.getvalue(), False)
    assert r.parse(fmt) == values


def test_format_multiplier():
    assert format_size("3* 8u") == 24
    assert format_size("16u 16u 24u 24u 20u 3u 5u 36U 16b") == 272
    fmt = "3* 4u"
    f = io.BytesIO()
    w = BitstreamWriter(f, False)
    w.build(fmt, [1, 2, 3])
    w.byte_align()
    w.flush()
    r = BitstreamReader(f.getvalue(), False)
    assert r.parse(fmt) == [1, 2, 3]


def test_callbacks():
    collected = []
    r = BitstreamReader(DATA, False)
    r.add_callback(collected.append)
    r.read(32)
    assert bytes(collected) == DATA

    collected2 = []
    f = io.BytesIO()
    w = BitstreamWriter(f, False)
    w.add_callback(collected2.append)
    w.write(16, 0xB1ED)
    w.write(16, 0x3BC1)
    assert bytes(collected2) == DATA


def test_pop_callback():
    collected = []
    r = BitstreamReader(DATA, False)
    r.add_callback(collected.append)
    r.read(8)
    cb = r.pop_callback()
    r.read(8)
    r.push_callback(cb)
    r.read(8)
    assert bytes(collected) == b"\xB1\x3B"


def test_mark_rewind():
    r = BitstreamReader(DATA, False)
    r.read(3)
    r.mark()
    assert r.read(5) == 0x11
    r.rewind()
    assert r.read(5) == 0x11
    r.unmark()


def test_read_bytes_and_skip():
    r = BitstreamReader(DATA, False)
    assert r.read_bytes(2) == b"\xB1\xED"
    r.skip_bytes(1)
    assert r.read(8) == 0xC1


def test_substream():
    r = BitstreamReader(DATA, False)
    sub = r.substream(2)
    assert sub.read(16) == 0xB1ED
    assert r.read(16) == 0x3BC1


def test_recorder():
    rec = BitstreamRecorder(False)
    rec.write(4, 0xB)
    rec.write(4, 0x1)
    assert rec.bits() == 8
    assert rec.bytes() == 1
    rec.write(2, 3)
    assert rec.bits() == 10

    f = io.BytesIO()
    w = BitstreamWriter(f, False)
    rec.copy(w)
    w.write(6, 0x2D)
    w.flush()
    assert f.getvalue() == b"\xB1\xED"


def test_recorder_reset():
    rec = BitstreamRecorder(False)
    rec.write(8, 0xFF)
    rec.reset()
    assert rec.bits() == 0
    rec.write(8, 0xAB)
    assert rec.data() == b"\xAB"


def test_accumulator():
    acc = BitstreamAccumulator(False)
    acc.write(3, 1)
    acc.write_signed(5, -3)
    acc.unary(0, 10)
    acc.write_bytes(b"xyz")
    assert acc.bits() == 3 + 5 + 11 + 24
    acc.byte_align()
    assert acc.bits() % 8 == 0


def test_huffman_tree():
    tree = HuffmanTree([[1], 0,
                        [0, 1], 1,
                        [0, 0, 1], 2,
                        [0, 0, 0], 3], False)
    # bits: 1 01 001 000 1 -> 0 1 2 3 0
    f = io.BytesIO()
    w = BitstreamWriter(f, False)
    for bit in [1, 0, 1, 0, 0, 1, 0, 0, 0, 1]:
        w.write(1, bit)
    w.byte_align()
    w.flush()
    r = BitstreamReader(f.getvalue(), False)
    assert [r.read_huffman_code(tree) for _ in range(5)] == [0, 1, 2, 3, 0]


def test_write_range_validation():
    w = BitstreamWriter(io.BytesIO(), False)
    with pytest.raises(ValueError):
        w.write(4, 16)
    with pytest.raises(ValueError):
        w.write(4, -1)
    with pytest.raises(ValueError):
        w.write_signed(4, 8)
    with pytest.raises(ValueError):
        w.write_signed(4, -9)


def test_reader_eof():
    r = BitstreamReader(b"\x00", False)
    r.read(8)
    with pytest.raises(IOError):
        r.read(1)


def test_large_values():
    f = io.BytesIO()
    w = BitstreamWriter(f, False)
    w.write(36, 2 ** 36 - 1)
    w.write(64, 2 ** 64 - 5)
    w.byte_align()
    w.flush()
    r = BitstreamReader(f.getvalue(), False)
    assert r.read(36) == 2 ** 36 - 1
    assert r.read(64) == 2 ** 64 - 5
