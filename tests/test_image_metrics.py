"""Image metric parser tests (meta/image.py).

Mirrors the reference's image coverage (test/test_core.py:662-838):
pure-Python size/depth/type parsers for JPEG, PNG, BMP, GIF and TIFF
over hand-crafted minimal files, plus error handling for truncated
and non-image data.
"""

import struct
import zlib

import pytest

from audiotools_tpu.meta.image import image_metrics, InvalidImage
from audiotools_tpu import Image


def make_png(width=3, height=2, bit_depth=8, color_type=2):
    def chunk(tag, payload):
        data = tag + payload
        return (struct.pack(">I", len(payload)) + data +
                struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF))
    ihdr = struct.pack(">IIBBBBB", width, height, bit_depth,
                       color_type, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) +
            chunk(b"IDAT", zlib.compress(b"\x00" * (width * 3 + 1) *
                                         height)) +
            chunk(b"IEND", b""))


def make_jpeg(width=5, height=4):
    # SOI + minimal SOF0 segment + EOI
    sof = struct.pack(">BBHBHHB", 0xFF, 0xC0, 11, 8,
                      height, width, 3) + b"\x01\x11\x00"
    return b"\xFF\xD8" + sof[:2] + sof[2:] + b"\xFF\xD9"


def make_bmp(width=7, height=5, bpp=24):
    header_size = 14 + 40
    row = (width * (bpp // 8) + 3) & ~3
    image_size = row * height
    return (b"BM" +
            struct.pack("<IHHI", header_size + image_size, 0, 0,
                        header_size) +
            struct.pack("<IiiHHIIiiII", 40, width, height, 1, bpp,
                        0, image_size, 2835, 2835, 0, 0) +
            b"\x00" * image_size)


def make_gif(width=9, height=6):
    return (b"GIF89a" + struct.pack("<HH", width, height) +
            b"\x70\x00\x00" + b"\x3b")


def make_tiff(width=11, height=8):
    # little-endian TIFF with ImageWidth(256)/ImageLength(257) tags
    def entry(tag, value):
        return struct.pack("<HHII", tag, 3, 1, value)
    ifd = (struct.pack("<H", 2) + entry(256, width) +
           entry(257, height) + struct.pack("<I", 0))
    return b"II*\x00" + struct.pack("<I", 8) + ifd


@pytest.mark.parametrize("maker,mime,size", [
    (make_png, u"image/png", (3, 2)),
    (make_jpeg, u"image/jpeg", (5, 4)),
    (make_bmp, u"image/x-ms-bmp", (7, 5)),
    (make_gif, u"image/gif", (9, 6)),
    (make_tiff, u"image/tiff", (11, 8)),
], ids=["png", "jpeg", "bmp", "gif", "tiff"])
def test_image_metrics(maker, mime, size):
    m = image_metrics(maker())
    assert m.mime_type == mime
    assert (m.width, m.height) == size


def test_png_palette_color_count():
    # color_type 3 = palette
    data = make_png(width=2, height=2, bit_depth=8, color_type=3)
    m = image_metrics(data)
    assert m.mime_type == u"image/png"


def test_invalid_data_raises():
    with pytest.raises(InvalidImage):
        image_metrics(b"this is not an image at all")


def test_truncated_png_raises():
    with pytest.raises(InvalidImage):
        image_metrics(make_png()[:12])


def test_empty_raises():
    with pytest.raises(InvalidImage):
        image_metrics(b"")


@pytest.mark.parametrize("maker,size", [
    (make_png, (3, 2)),
    (make_jpeg, (5, 4)),
    (make_gif, (9, 6)),
], ids=["png", "jpeg", "gif"])
def test_image_object_carries_metrics(maker, size):
    img = Image.new(maker(), u"front cover", 0)
    assert (img.width, img.height) == size
    assert img.type == 0
    assert img.description == u"front cover"
