"""CRC primitives for FLAC (CRC-8 poly 0x07, CRC-16 poly 0x8005) and
TTA (CRC-32), table-driven, tables generated from the polynomials.

Behavioral equivalents of reference common/flac_crc.c and
common/tta_crc.c; tables are derived, not copied.
"""

from __future__ import annotations

import numpy as np


def _make_table(poly, width):
    table = np.zeros(256, dtype=np.uint32)
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    for byte in range(256):
        crc = byte << (width - 8)
        for _ in range(8):
            if crc & top:
                crc = ((crc << 1) ^ poly) & mask
            else:
                crc = (crc << 1) & mask
        table[byte] = crc
    return table


CRC8_TABLE = _make_table(0x07, 8)
CRC16_TABLE = _make_table(0x8005, 16)


def _make_crc32_table():
    # reflected CRC-32 (poly 0xEDB88320), zlib-compatible, used by TTA
    table = np.zeros(256, dtype=np.uint32)
    for byte in range(256):
        crc = byte
        for _ in range(8):
            if crc & 1:
                crc = (crc >> 1) ^ 0xEDB88320
            else:
                crc >>= 1
        table[byte] = crc
    return table


CRC32_TABLE = _make_crc32_table()


class CRC8:
    """a streaming CRC-8 (poly 0x07), usable as a bitstream callback"""

    def __init__(self):
        self.value = 0

    def __int__(self):
        return int(self.value)

    def update(self, byte):
        self.value = int(CRC8_TABLE[self.value ^ byte])


class CRC16:
    """a streaming CRC-16 (poly 0x8005), usable as a bitstream callback"""

    def __init__(self):
        self.value = 0

    def __int__(self):
        return int(self.value)

    def update(self, byte):
        self.value = int(CRC16_TABLE[(self.value >> 8) ^ byte] ^
                         ((self.value << 8) & 0xFFFF))


def crc8(data, initial=0):
    """returns the CRC-8 of a bytes object"""
    value = initial
    for byte in data:
        value = int(CRC8_TABLE[value ^ byte])
    return value


def crc16(data, initial=0):
    """returns the CRC-16 of a bytes object"""
    value = initial
    for byte in data:
        value = int(CRC16_TABLE[(value >> 8) ^ byte] ^
                    ((value << 8) & 0xFFFF))
    return value


def crc32(data, initial=0xFFFFFFFF):
    """returns the running reflected CRC-32 of a bytes object

    (TTA finalizes with ^ 0xFFFFFFFF; zlib.crc32 pre/post-inverts,
    so adapt its state convention to the raw register value)"""
    import zlib
    return zlib.crc32(data, initial ^ 0xFFFFFFFF) ^ 0xFFFFFFFF
