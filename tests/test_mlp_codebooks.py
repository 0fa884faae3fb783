"""Independent MLP entropy-layer validation against the reference's
own compiled codebook artifacts.

``ref/mlp.py``'s Huffman codebooks were previously proven only
against their own encoder (round-trip).  This suite decodes bit
streams with the reference's SHIPPED jump tables
(``/root/reference/src/decoders/mlp_codebook{1,2,3}.h`` — compiled
artifacts this repo did not produce, consumed by
``mlp.c:read_mlp_residual_data``) by mirroring the
``FUNC_READ_HUFFMAN_CODE`` walk (``src/bitstream.c:948-975``: state
is a 9-bit byte bank ``(1 << size) | value``, ``NEW_STATE(byte) =
0x100 | byte``) and asserts our algebraic ``read_huffman`` /
``write_huffman`` agree code for code and on whole random streams.
"""

import io
import os
import re

import numpy as np
import pytest

from audiotools_tpu.bitstream import BitstreamReader, BitstreamWriter
from audiotools_tpu.ref import mlp as ref_mlp

CODEBOOK_DIR = "/root/reference/src/decoders"

requires_ref = pytest.mark.skipif(
    not os.path.exists(os.path.join(CODEBOOK_DIR, "mlp_codebook1.h")),
    reason="reference codebook headers not present")


def load_codebook(n):
    """parses mlp_codebookN.h into int32 [contexts, 512, 4]
    ({continue_, node, state, value} per entry)"""
    path = os.path.join(CODEBOOK_DIR, "mlp_codebook%d.h" % n)
    with open(path) as f:
        text = f.read()
    entries = re.findall(
        r"\{\s*(\d+)\s*,\s*(\d+)\s*,\s*(0x[0-9A-Fa-f]+|\d+)\s*,"
        r"\s*(-?\d+)\s*\}", text)
    arr = np.array([[int(a), int(b), int(c, 0), int(d)]
                    for (a, b, c, d) in entries], dtype=np.int64)
    assert arr.shape[0] % 0x200 == 0, arr.shape
    return arr.reshape(-1, 0x200, 4)


class RefTableDecoder:
    """mirrors the reference's br_read_huffman_code walk over a byte
    string (big-endian reader, state = 9-bit byte bank)"""

    def __init__(self, table, data):
        self.table = table
        self.data = data
        self.pos = 0            # bytes fed
        self.state = 0

    def read_one(self):
        entry = self.table[0][self.state]
        while entry[0]:                       # continue_
            if self.pos >= len(self.data):
                raise EOFError()
            state = 0x100 | self.data[self.pos]
            self.pos += 1
            entry = self.table[entry[1]][state]
        self.state = int(entry[2])
        return int(entry[3])

    def bits_consumed(self):
        """bank size = bit_length(state) - 1 unread bits remain"""
        left = max(int(self.state).bit_length() - 1, 0)
        return self.pos * 8 - left


def our_code_bits(book, value):
    """bit list of write_huffman's code for value, captured through
    a real BitstreamWriter + recorder-style byte tap"""
    out = io.BytesIO()
    w = BitstreamWriter(out, False)
    ref_mlp.write_huffman(w, book, value)
    # flush with a marker: pad to a byte boundary with ones so the
    # code's own bits can be recovered exactly
    dense = {1: 2, 2: 1, 3: 0}[book]
    top = {1: 11, 2: 9, 3: 8}[book]
    if 7 <= value < 7 + (1 << dense):
        length = 1 + dense
    elif top <= value <= top + 6:
        length = 2 + (value - top) + 1
    else:
        length = 2 + (6 - value) + 1
    w.unary(0, 0)               # guarantee at least one padding bit
    w.byte_align()
    w.flush()
    data = out.getvalue()
    allbits = [(byte >> (7 - i)) & 1
               for byte in data for i in range(8)]
    return allbits[:length]


@requires_ref
@pytest.mark.parametrize("book", [1, 2, 3])
def test_every_code_matches_reference_table(book):
    """our code for every codable MSB decodes to the same value,
    consuming exactly the code length, via the reference's table"""
    table = load_codebook(book)
    dense = {1: 2, 2: 1, 3: 0}[book]
    top = {1: 11, 2: 9, 3: 8}[book]
    values = list(range(0, 7)) + \
        list(range(7, 7 + (1 << dense))) + \
        list(range(top, top + 7))
    for value in sorted(set(values)):
        bits = our_code_bits(book, value)
        # pack MSB-first, pad with ones (a stop pattern that keeps
        # any over-read from hanging)
        padded = bits + [1] * ((8 - len(bits) % 8) % 8 + 8)
        data = bytes(
            int("".join(map(str, padded[i:i + 8])), 2)
            for i in range(0, len(padded), 8))
        dec = RefTableDecoder(table, data)
        got = dec.read_one()
        assert got == value, (book, value, got)
        assert dec.bits_consumed() == len(bits), \
            (book, value, dec.bits_consumed(), len(bits))


@requires_ref
@pytest.mark.parametrize("book", [1, 2, 3])
def test_random_value_stream_through_reference_table(book):
    """a long stream of random codable values, bit-packed by our
    encoder, decodes back identically through the reference jump
    table AND through our reader at the same bit positions"""
    dense = {1: 2, 2: 1, 3: 0}[book]
    top = {1: 11, 2: 9, 3: 8}[book]
    codable = sorted(set(
        list(range(0, 7 + (1 << dense))) + list(range(top, top + 7))))
    rng = np.random.default_rng(100 + book)
    values = rng.choice(codable, size=5000)

    bits = []
    for v in values:
        bits.extend(our_code_bits(book, int(v)))
    boundary_bits = np.cumsum(
        [len(our_code_bits(book, int(v))) for v in values])
    padded = bits + [1] * ((8 - len(bits) % 8) % 8 + 8)
    data = bytes(int("".join(map(str, padded[i:i + 8])), 2)
                 for i in range(0, len(padded), 8))

    table = load_codebook(book)
    ref_dec = RefTableDecoder(table, data)
    ours = BitstreamReader(data, False)
    for (i, v) in enumerate(values):
        ref_val = ref_dec.read_one()
        our_val = ref_mlp.read_huffman(ours, book)
        assert ref_val == our_val == int(v), (book, i, ref_val,
                                              our_val, int(v))
        assert ref_dec.bits_consumed() == int(boundary_bits[i]), \
            (book, i, ref_dec.bits_consumed(), int(boundary_bits[i]))
