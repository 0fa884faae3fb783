"""MusicBrainz disc IDs and lookups
(reference audiotools/musicbrainz.py)."""

from __future__ import annotations

from base64 import b64encode
from hashlib import sha1


class DiscID:
    """a MusicBrainz disc ID (reference musicbrainz.py:21-56)"""

    def __init__(self, first_track_number, last_track_number,
                 lead_out_offset, offsets):
        """offsets: track offsets in CD frames (LBA, incl. the
        150-frame lead-in); lead_out_offset likewise"""
        assert (last_track_number - first_track_number + 1) == \
            len(offsets)
        self.first_track_number = first_track_number
        self.last_track_number = last_track_number
        self.lead_out_offset = lead_out_offset
        self.offsets = offsets

    def __repr__(self):
        return "DiscID(%r, %r, %r, %r)" % (
            self.first_track_number, self.last_track_number,
            self.lead_out_offset, self.offsets)

    def __str__(self):
        digest = sha1(("%2.2X%2.2X%s" % (
            self.first_track_number,
            self.last_track_number,
            "".join("%8.8X" % (offset,) for offset in
                    ([self.lead_out_offset] + self.offsets +
                     [0] * (99 - len(self.offsets)))))).encode(
                         "ascii")).digest()
        return b64encode(digest, b"._").decode(
            "ascii").replace("=", "-")


def disc_id(cdda):
    """builds a DiscID from a CDDA object (image-backed)"""
    offsets = [start + 150 for (start, _length) in
               cdda.track_offsets()]
    return DiscID(first_track_number=1,
                  last_track_number=len(cdda),
                  lead_out_offset=cdda.cdda.last_sector() + 150 + 1,
                  offsets=offsets)


def perform_lookup(disc_id, musicbrainz_server="musicbrainz.org",
                   musicbrainz_port=80):
    """queries MusicBrainz for disc metadata (XML response text)

    returns an empty string when the service is unreachable"""
    from urllib.request import urlopen
    from urllib.error import URLError

    url = ("http://%s:%d/ws/2/discid/%s?inc=artists+recordings" %
           (musicbrainz_server, musicbrainz_port, str(disc_id)))
    try:
        with urlopen(url, timeout=15) as response:
            return response.read().decode("utf-8", "replace")
    except (URLError, OSError):
        return ""
