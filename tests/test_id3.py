"""ID3v1 / ID3v2.2 / v2.3 / v2.4 metadata tests, including the
MetaData conversion matrix across all tag formats (mirrors the
reference test/test_metadata.py strategy)."""

import io

import pytest

from audiotools_tpu.audiofile import MetaData, Image
from audiotools_tpu.bitstream import BitstreamWriter
from audiotools_tpu.meta.id3 import (ID3v22Comment, ID3v23Comment,
                                     ID3v24Comment, ID3CommentPair,
                                     read_id3v2_comment,
                                     skip_id3v2_comment,
                                     total_id3v2_comments,
                                     decode_syncsafe32,
                                     encode_syncsafe32)
from audiotools_tpu.meta.id3v1 import ID3v1Comment

PNG = (b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\rIHDR" +
       (16).to_bytes(4, "big") + (12).to_bytes(4, "big") +
       bytes([8, 2, 0, 0, 0]) + b"\x00" * 4)


def full_metadata():
    return MetaData(track_name="Träck Näme",
                    track_number=3, track_total=10,
                    album_name="Album", artist_name="Artist",
                    performer_name="Performer",
                    composer_name="Composer",
                    conductor_name="Conductor", media="CD",
                    ISRC="USABC1234567", copyright="(c) 2024",
                    publisher="Pub", year="2024", date="2024-05-06",
                    album_number=1, album_total=2,
                    comment="some comment")


def build_bytes(tag):
    buf = io.BytesIO()
    w = BitstreamWriter(buf, False)
    tag.build(w)
    w.flush()
    return buf.getvalue()


def test_syncsafe():
    for v in (0, 1, 127, 128, 0xFFFF, 0x0FFFFFFF):
        assert decode_syncsafe32(encode_syncsafe32(v)) == v


V2_CLASSES = [ID3v22Comment, ID3v23Comment, ID3v24Comment]


@pytest.mark.parametrize("cls", V2_CLASSES)
def test_id3v2_roundtrip(cls):
    md = full_metadata()
    tag = cls.converted(md)
    tag.add_image(Image(PNG, "image/png", 16, 12, 24, 0, "front", 0))
    data = build_bytes(tag)
    parsed = read_id3v2_comment(io.BytesIO(data))
    assert isinstance(parsed, cls)
    for field in ("track_name", "track_number", "track_total",
                  "album_name", "artist_name", "performer_name",
                  "composer_name", "conductor_name", "media", "ISRC",
                  "copyright", "publisher", "year", "date",
                  "album_number", "album_total", "comment"):
        assert getattr(parsed, field) == getattr(md, field), field
    images = parsed.images()
    assert len(images) == 1
    assert images[0].mime_type == "image/png"
    assert images[0].data == PNG
    assert images[0].width == 16
    assert images[0].height == 12
    assert images[0].type == 0


@pytest.mark.parametrize("cls", V2_CLASSES)
def test_id3v2_set_delete_semantics(cls):
    tag = cls.converted(full_metadata())
    tag.track_number = 7
    assert tag.track_number == 7
    assert tag.track_total == 10
    del tag.track_number
    assert tag.track_number is None or tag.track_number == 0
    assert tag.track_total == 10
    del tag.track_total
    assert tag.track_total is None
    tag.track_name = "New"
    assert tag.track_name == "New"
    del tag.track_name
    assert tag.track_name is None


def test_id3v1_roundtrip():
    md = full_metadata()
    v1 = ID3v1Comment.converted(md)
    buf = io.BytesIO()
    v1.build(buf)
    assert buf.tell() == 128
    buf.seek(0)
    parsed = ID3v1Comment.parse(buf)
    assert parsed.track_name == "Träck Näme"      # fits latin-1
    assert parsed.track_number == 3
    assert parsed.album_name == "Album"
    assert parsed.artist_name == "Artist"
    assert parsed.year == "2024"
    assert parsed.comment == "some comment"
    # unstorable fields read back as None
    assert parsed.track_total is None
    assert parsed.composer_name is None


def test_id3_comment_pair():
    md = full_metadata()
    pair = ID3CommentPair.converted(md)
    assert pair.track_name == md.track_name
    assert pair.track_number == 3
    pair.track_number = 9
    assert pair.id3v2.track_number == 9
    assert pair.id3v1.track_number == 9
    assert isinstance(pair.id3v2, ID3v23Comment)


# ---- conversion matrix ------------------------------------------------

def _vorbis():
    from audiotools_tpu.meta.vorbiscomment import VorbisComment
    return VorbisComment


def _ape():
    from audiotools_tpu.meta.ape import ApeTag
    return ApeTag


MATRIX = [ID3v22Comment, ID3v23Comment, ID3v24Comment, ID3v1Comment]


@pytest.mark.parametrize("src_cls", MATRIX)
@pytest.mark.parametrize("dst_cls", MATRIX)
def test_conversion_matrix_id3(src_cls, dst_cls):
    md = full_metadata()
    src = src_cls.converted(md)
    dst = dst_cls.converted(src)
    # fields storable by BOTH formats must survive
    v1_fields = ("track_name", "artist_name", "album_name", "year",
                 "comment", "track_number")
    fields = (v1_fields if (src_cls is ID3v1Comment or
                            dst_cls is ID3v1Comment)
              else MetaData.FIELDS)
    for field in fields:
        if field == "catalog":
            continue            # no ID3 mapping (like the reference)
        assert getattr(dst, field) == getattr(md, field), \
            (src_cls.__name__, dst_cls.__name__, field)


@pytest.mark.parametrize("id3_cls", V2_CLASSES)
def test_conversion_matrix_cross_format(id3_cls):
    VorbisComment = _vorbis()
    ApeTag = _ape()
    md = full_metadata()
    # ID3 -> Vorbis -> APE -> ID3
    id3 = id3_cls.converted(md)
    vc = VorbisComment.converted(id3)
    ape = ApeTag.converted(vc)
    back = id3_cls.converted(ape)
    # fields unstorable somewhere along the chain (same set as the
    # reference maps): catalog (ID3), date (VorbisComment),
    # media (ApeTag)
    for field in MetaData.FIELDS:
        if field in ("catalog", "date", "media"):
            continue
        assert getattr(back, field) == getattr(md, field), field


def test_clean_strips_whitespace_and_zeroes():
    tag = ID3v23Comment.converted(
        MetaData(track_name="  padded  ", track_number=3))
    # inject leading zeroes
    from audiotools_tpu.meta.id3 import ID3TextFrame
    for (i, f) in enumerate(tag.frames):
        if f.id == b"TRCK":
            tag.frames[i] = ID3TextFrame(b"TRCK", 0, ["03"])
    (cleaned, fixes) = tag.clean()
    assert cleaned.track_name == "padded"
    assert cleaned.track_number == 3
    assert cleaned[b"TRCK"][0].strings == ["3"]
    assert len(fixes) >= 2


def test_skip_and_count_id3v2():
    md = full_metadata()
    data = build_bytes(ID3v23Comment.converted(md))
    stream = io.BytesIO(data + data + b"fLaC....")
    assert total_id3v2_comments(stream) == 2
    skipped = skip_id3v2_comment(stream)
    assert skipped == 2 * len(data)
    assert stream.read(4) == b"fLaC"


def test_utf16_content_survives():
    md = MetaData(track_name="日本語 テスト")
    for cls in V2_CLASSES:
        parsed = read_id3v2_comment(
            io.BytesIO(build_bytes(cls.converted(md))))
        assert parsed.track_name == md.track_name, cls.NAME
