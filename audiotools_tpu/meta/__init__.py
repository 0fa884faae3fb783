"""Metadata formats: ID3, ApeTag, VorbisComment, M4A atoms, images."""
