"""FreeDB disc IDs and lookups (reference audiotools/freedb.py)."""

from __future__ import annotations


class DiscID:
    """a FreeDB disc ID (reference freedb.py:21-52)"""

    def __init__(self, offsets, total_length, track_count):
        """offsets: track offsets in CD frames (LBA, incl. the
        150-frame lead-in); total_length: disc length in CD frames;
        track_count: number of tracks"""
        assert len(offsets) == track_count
        self.offsets = offsets
        self.total_length = total_length
        self.track_count = track_count

    def __repr__(self):
        return "DiscID(%r, %r, %r)" % (self.offsets,
                                       self.total_length,
                                       self.track_count)

    def __str__(self):
        return "%8.8X" % (int(self),)

    def __int__(self):
        digitsum = sum(map(int, "".join(
            str(o // 75) for o in self.offsets))) % 255
        seconds_length = self.total_length // 75
        return ((digitsum << 24) |
                ((seconds_length & 0xFFFF) << 8) |
                self.track_count)


def disc_id(cdda):
    """builds a DiscID from a CDDA object (image-backed)"""
    offsets = [start + 150 for (start, _length) in
               cdda.track_offsets()]
    return DiscID(offsets=offsets,
                  total_length=cdda.cdda.last_sector(),
                  track_count=len(cdda))


def perform_lookup(disc_id, freedb_server="us.freedb.org",
                   freedb_port=80):
    """performs a freedb lookup, returning matching XMCD entries

    returns an empty list when the service is unreachable"""
    from urllib.request import urlopen
    from urllib.error import URLError

    query = "cmd=cddb+query+%s&hello=user+host+audiotools+1.0&proto=6" \
        % (str(disc_id),)
    url = "http://%s:%d/~cddb/cddb.cgi?%s" % (freedb_server,
                                              freedb_port, query)
    try:
        with urlopen(url, timeout=15) as response:
            return response.read().decode("utf-8", "replace")
    except (URLError, OSError):
        return ""
