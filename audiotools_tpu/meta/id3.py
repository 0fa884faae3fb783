"""ID3v2/ID3v1 metadata support.

Rebuild of the reference ID3 layer (``/root/reference/audiotools/id3.py``,
``id3v1.py``).  This module currently provides the tag-skipping and
C-era helpers needed by the FLAC/TTA/MP3 formats; the full frame model
(ID3v2.2/2.3/2.4 text/picture frames, syncsafe ints, ID3CommentPair)
lands with the metadata subsystem.
"""

from __future__ import annotations


def skip_id3v2_comment(file):
    """seeks past an ID3v2 comment at the current file position

    returns the total number of bytes skipped (0 if no tag present)"""
    start = file.tell()
    header = file.read(10)
    if (len(header) == 10 and header[0:3] == b"ID3" and
            header[3] in (2, 3, 4)):
        tag_size = 0
        for b in header[6:10]:
            tag_size = (tag_size << 7) | (b & 0x7F)
        total = 10 + tag_size
        file.seek(start + total, 0)
        # handle stacked ID3v2 tags
        return total + skip_id3v2_comment(file)
    else:
        file.seek(start, 0)
        return 0


def total_id3v2_comments(file):
    """returns the number of consecutive ID3v2 tags at this position"""
    start = file.tell()
    count = 0
    while True:
        header = file.read(10)
        if (len(header) == 10 and header[0:3] == b"ID3" and
                header[3] in (2, 3, 4)):
            tag_size = 0
            for b in header[6:10]:
                tag_size = (tag_size << 7) | (b & 0x7F)
            file.seek(tag_size, 1)
            count += 1
        else:
            break
    file.seek(start, 0)
    return count
