"""Metadata lookup services: FreeDB, MusicBrainz, AccurateRip.

Rebuild of the reference service layer (``/root/reference/audiotools/
freedb.py``, ``musicbrainz.py``, ``accuraterip.py``): disc-ID algebras
computed locally plus HTTP lookup clients (network access is gated —
lookups degrade to empty results when unreachable, like the
reference's URLError handling)."""
