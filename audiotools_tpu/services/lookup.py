"""Disc metadata lookups: service responses -> MetaData choices.

Role of the reference ``metadata_lookup`` (``audiotools/
__init__.py:5039``) and the response parsers in ``freedb.py`` /
``musicbrainz.py``: FreeDB XMCD entries and MusicBrainz discid XML
are converted into per-track MetaData lists; each service contributes
one "choice" the UI layer can present.  Lookups degrade to an empty
choice list offline.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET

from ..audiofile import MetaData


def parse_xmcd(xmcd_text, track_count):
    """parses a FreeDB XMCD entry into a list of MetaData
    (one per track); returns None if unparseable"""
    if "# xmcd" not in xmcd_text.splitlines()[0:1][0:] and \
            not xmcd_text.lstrip().startswith("# xmcd"):
        if "DTITLE" not in xmcd_text:
            return None
    fields = {}
    for line in xmcd_text.splitlines():
        match = re.match(r"^([A-Z0-9]+)=(.*)$", line.strip())
        if match is not None:
            (key, value) = match.groups()
            fields[key] = fields.get(key, "") + value

    dtitle = fields.get("DTITLE", "")
    if " / " in dtitle:
        (artist, album) = dtitle.split(" / ", 1)
    else:
        (artist, album) = ("", dtitle)
    year = fields.get("DYEAR", "") or None

    metadatas = []
    for i in range(track_count):
        ttitle = fields.get("TTITLE%d" % (i,), "")
        if " / " in ttitle:
            (track_artist, track_name) = ttitle.split(" / ", 1)
        else:
            (track_artist, track_name) = (artist, ttitle)
        metadatas.append(MetaData(track_name=track_name or None,
                                  track_number=i + 1,
                                  track_total=track_count,
                                  album_name=album or None,
                                  artist_name=track_artist or None,
                                  year=year))
    return metadatas


_MB_NS = "{http://musicbrainz.org/ns/mmd-2.0#}"


def parse_musicbrainz_xml(xml_text, track_count):
    """parses a MusicBrainz discid XML response into a list of
    MetaData choices (one list per matching release)"""
    try:
        root = ET.fromstring(xml_text)
    except ET.ParseError:
        return []
    choices = []
    for release in root.iter(_MB_NS + "release"):
        album = release.findtext(_MB_NS + "title") or None
        date = release.findtext(_MB_NS + "date") or None
        year = date.split("-")[0] if date else None
        artist = None
        credit = release.find(_MB_NS + "artist-credit")
        if credit is not None:
            name = credit.find(".//" + _MB_NS + "name")
            if name is not None:
                artist = name.text
        tracks = []
        for (i, track) in enumerate(
                release.iter(_MB_NS + "track")):
            recording = track.find(_MB_NS + "recording")
            title = (recording.findtext(_MB_NS + "title")
                     if recording is not None else None)
            tracks.append(MetaData(track_name=title,
                                   track_number=i + 1,
                                   track_total=track_count,
                                   album_name=album,
                                   artist_name=artist,
                                   year=year))
        if not tracks:
            tracks = [MetaData(track_number=i + 1,
                               track_total=track_count,
                               album_name=album,
                               artist_name=artist,
                               year=year)
                      for i in range(track_count)]
        choices.append(tracks)
    return choices


def metadata_lookup(cdda, musicbrainz_server="musicbrainz.org",
                    freedb_server="us.freedb.org",
                    use_musicbrainz=True, use_freedb=True):
    """generates MetaData choices for a CDDA disc
    (reference __init__.py:5039): returns metadata[choice][track]
    lists; always ends with a default all-blank choice"""
    track_count = len(cdda)
    choices = []

    if use_musicbrainz:
        from . import musicbrainz
        response = musicbrainz.perform_lookup(
            musicbrainz.disc_id(cdda),
            musicbrainz_server=musicbrainz_server)
        if response:
            choices.extend(parse_musicbrainz_xml(response,
                                                 track_count))
    if use_freedb:
        from . import freedb
        response = freedb.perform_lookup(
            freedb.disc_id(cdda), freedb_server=freedb_server)
        if response:
            parsed = parse_xmcd(response, track_count)
            if parsed is not None:
                choices.append(parsed)

    # the default choice: track numbers only
    choices.append([MetaData(track_number=i + 1,
                             track_total=track_count)
                    for i in range(track_count)])
    return choices
