"""Bitstream engine edge cases.

Extends tests/test_bitstream.py toward the reference's exhaustive
coverage (test/test_core.py:2029+): limited_unary, mid-stream
endianness switches, position save/restore, format-language skip and
alignment tokens, huffman write/read duality, recorder swap,
nested callbacks, and width extremes (1..64-bit reads/writes).
"""

import io

import pytest

from audiotools_tpu.bitstream import (BitstreamReader, BitstreamWriter,
                                      BitstreamRecorder,
                                      BitstreamAccumulator,
                                      HuffmanTree, format_size,
                                      format_byte_size)


def be_reader(data):
    return BitstreamReader(io.BytesIO(bytes(data)), False)


def le_reader(data):
    return BitstreamReader(io.BytesIO(bytes(data)), True)


def written(little_endian, fn):
    buf = io.BytesIO()
    w = BitstreamWriter(buf, little_endian)
    fn(w)
    w.flush()
    return buf.getvalue()


# ------------------------------------------------------- unary -----

def test_limited_unary_within_limit():
    # 0b00010000: three 0s then a 1 (BE)
    r = be_reader([0b00010000])
    assert r.limited_unary(1, 8) == 3


def test_limited_unary_exceeds_limit():
    r = be_reader([0x00, 0x00])
    assert r.limited_unary(1, 8) is None


def test_limited_unary_le():
    r = le_reader([0b00001000])
    assert r.limited_unary(1, 8) == 3


# --------------------------------------------- width extremes ------

@pytest.mark.parametrize("little", [False, True])
@pytest.mark.parametrize("bits,value", [
    (1, 1), (2, 3), (7, 100), (8, 255), (9, 300), (15, 32000),
    (16, 65535), (17, 100000), (24, 0xFEDCBA), (31, (1 << 31) - 1),
    (32, 0xDEADBEEF), (33, (1 << 33) - 5), (64, (1 << 64) - 2),
])
def test_write_read_width(little, bits, value):
    data = written(little, lambda w: (w.write(bits, value),
                                      w.byte_align()))
    r = BitstreamReader(io.BytesIO(data), little)
    assert r.read(bits) == value


@pytest.mark.parametrize("little", [False, True])
@pytest.mark.parametrize("bits,value", [
    (2, -1), (2, -2), (8, -128), (8, 127), (16, -32768),
    (17, -65536), (32, -(1 << 31)), (33, -(1 << 32)),
    (64, -(1 << 63)),
])
def test_write_read_signed_width(little, bits, value):
    data = written(little, lambda w: (w.write_signed(bits, value),
                                      w.byte_align()))
    r = BitstreamReader(io.BytesIO(data), little)
    assert r.read_signed(bits) == value


# ------------------------------------------- format language -------

def test_format_size_tokens():
    assert format_size("16u 8s 3p 2P 4b") == 16 + 8 + 3 + 16 + 32
    assert format_byte_size("32u 32u") == 8
    # alignment token pads to the next byte
    assert format_size("3u a 8u") == 16
    # multiplier
    assert format_size("4* 8u") == 32


def test_parse_with_skip_and_align():
    data = written(False, lambda w: w.build("8u 3u a 16u", [7, 5, 300]))
    r = be_reader(data)
    assert r.parse("8p 3u a 16u") == [5, 300]


def test_parse_bytes_token():
    data = written(False, lambda w: w.build("4b 8u", [b"fLaC", 9]))
    r = be_reader(data)
    assert r.parse("4b 8u") == [b"fLaC", 9]


def test_build_wrong_value_count_raises():
    with pytest.raises(IndexError):
        written(False, lambda w: w.build("8u 8u", [1]))


# ------------------------------------------------- positioning -----

def test_getpos_setpos_roundtrip():
    r = be_reader(b"\x01\x02\x03\x04")
    assert r.read(8) == 1
    pos = r.getpos()
    assert r.read(8) == 2
    r.setpos(pos)
    assert r.read(8) == 2


def test_seek_whence():
    r = be_reader(b"\x10\x20\x30\x40")
    r.seek(2, 0)
    assert r.read(8) == 0x30
    r.seek(-1, 2)
    assert r.read(8) == 0x40
    r.seek(0, 0)
    r.read(8)
    r.seek(1, 1)
    assert r.read(8) == 0x30


def test_nested_mark_rewind():
    r = be_reader(b"\xAA\xBB\xCC\xDD")
    r.mark()
    assert r.read(8) == 0xAA
    r.mark()
    assert r.read(8) == 0xBB
    r.rewind()                   # back to after 0xAA
    assert r.read(8) == 0xBB
    r.unmark()
    r.rewind()                   # back to start
    assert r.read(8) == 0xAA
    r.unmark()


# ------------------------------------------------- endianness ------

def test_set_endianness_midstream_realigns():
    r = be_reader(b"\xF0\x0F")
    assert r.read(4) == 0xF
    r.set_endianness(True)       # discards partial state, realigns
    assert r.read(4) == 0xF      # LE: low nibble of 0x0F first


# ---------------------------------------------------- huffman ------

def test_huffman_write_read_duality():
    table = [[1], 0, [0, 1], 1, [0, 0, 1], 2, [0, 0, 0], 3]
    for little in (False, True):
        tree = HuffmanTree(table, little)
        values = [0, 1, 2, 3, 2, 1, 0, 3, 3, 0]
        data = written(little, lambda w: (
            [w.write_huffman_code(tree, v) for v in values],
            w.byte_align()))
        r = BitstreamReader(io.BytesIO(data), little)
        assert [r.read_huffman_code(tree) for _ in values] == values


def test_huffman_invalid_table_raises():
    with pytest.raises(Exception):
        HuffmanTree([[1], 0, [1], 1], False)   # duplicate path


# ------------------------------------------- recorder/accumulator --

def test_recorder_swap():
    a = BitstreamRecorder(False)
    b = BitstreamRecorder(False)
    a.write(8, 1)
    b.write(8, 2)
    b.write(8, 3)
    a.swap(b)
    assert a.bits() == 16 and b.bits() == 8


def test_recorder_copy_into_writer():
    rec = BitstreamRecorder(False)
    rec.build("8u 16u 3u a", [9, 500, 5])
    buf = io.BytesIO()
    w = BitstreamWriter(buf, False)
    rec.copy(w)
    w.flush()
    r = be_reader(buf.getvalue())
    assert r.parse("8u 16u 3u a") == [9, 500, 5]


def test_accumulator_counts_everything():
    acc = BitstreamAccumulator(False)
    acc.write(3, 5)
    acc.write_signed(5, -7)
    acc.unary(1, 4)
    acc.write_bytes(b"xy")
    assert acc.bits() == 3 + 5 + 5 + 16


def test_recorder_matches_writer_bytes():
    def emit(w):
        w.write(5, 21)
        w.write_signed(7, -40)
        w.unary(0, 3)
        w.byte_align()
        w.write_bytes(b"ok")
    direct = written(False, emit)
    rec = BitstreamRecorder(False)
    emit(rec)
    assert rec.data() == direct


# ---------------------------------------------------- callbacks ----

def test_push_pop_callback_nesting():
    seen1 = []
    seen2 = []
    r = be_reader(b"\x01\x02\x03")
    r.add_callback(seen1.append)
    r.read(8)
    # callbacks stack: every active callback sees every byte
    r.push_callback(seen2.append)
    r.read(8)
    r.pop_callback()
    r.read(8)
    assert seen1 == [1, 2, 3]
    assert seen2 == [2]


def test_substream_isolated_reads():
    r = be_reader(b"\x01\x02\x03\x04")
    r.skip_bytes(1)
    sub = r.substream(2)
    assert sub.read(16) == 0x0203
    # parent continues after the substream bytes
    assert r.read(8) == 0x04


def test_substream_past_end_raises():
    r = be_reader(b"\x01")
    with pytest.raises(IOError):
        r.substream(5)
