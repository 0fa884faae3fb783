"""Fast FLAC decoder: C++ frame decode behind the PCMReader protocol.

The production decode path (reference counterpart
``/root/reference/src/decoders/flac.c``): metadata blocks are parsed in
Python, then the raw frame stream is handed to the native decoder
(``_native.atpu_flac_decode``) in large chunks — Rice decoding is
bit-serial host work by nature, and the synthesis recurrences run as
int64 loops at memory speed.  The stream MD5 is verified at EOF like
the reference (flac.c:195-207).
"""

from __future__ import annotations

from .. import text

import numpy as np

from .. import pcm
from .. import _native
from ..bitstream import BitstreamReader

# read granularity in compressed bytes
CHUNK_BYTES = 0x200000


class FastFlacDecoder:
    """a PCMReader-compatible FLAC decoder over the native kernels"""

    CHANNEL_COUNT_MASKS = {1: 0x0004, 2: 0x0003, 3: 0x0007, 4: 0x0033,
                           5: 0x0037, 6: 0x003F, 7: 0x013F, 8: 0x063F}

    def __init__(self, file_or_path, channel_mask=None):
        if isinstance(file_or_path, str):
            self.file = open(file_or_path, "rb")
        else:
            self.file = file_or_path

        reader = BitstreamReader(self.file, False)
        if reader.read_bytes(4) != b"fLaC":
            raise ValueError("invalid FLAC file (no 'fLaC' marker)")

        streaminfo = None
        self.seektable = []
        last = 0
        while last != 1:
            (last, block_type, block_length) = reader.parse("1u 7u 24u")
            if block_type == 0:
                (self.minimum_block_size,
                 self.maximum_block_size,
                 self.minimum_frame_size,
                 self.maximum_frame_size,
                 self.sample_rate,
                 channels,
                 bps,
                 self.total_frames,
                 self.md5sum) = reader.parse(
                     "16u 16u 24u 24u 20u 3u 5u 36U 16b")
                self.channels = channels + 1
                self.bits_per_sample = bps + 1
                streaminfo = True
            elif block_type == 3:
                self.seektable = [
                    reader.parse("64U 64U 16u")
                    for _ in range(block_length // 18)]
            else:
                reader.skip_bytes(block_length)
        if streaminfo is None:
            raise ValueError("no STREAMINFO block found")
        self.frames_offset = self.file.tell()

        if channel_mask:
            self.channel_mask = channel_mask
        else:
            self.channel_mask = self.CHANNEL_COUNT_MASKS.get(
                self.channels, 0)

        self.buffer = bytearray()
        self.buf_off = 0          # consumed prefix of self.buffer
        self.current_md5 = _native.MD5()
        self.decoded_frames = 0
        self.eof = False
        self.closed = False

    def read(self, pcm_frames):
        """decodes up to a chunk of FLAC frames"""
        if self.closed:
            raise ValueError("stream is closed")
        if self.eof:
            return pcm.empty_framelist(self.channels,
                                       self.bits_per_sample)

        # keep the compressed buffer topped up; consumed bytes are
        # tracked by offset (no per-read reslice copies)
        file_exhausted = False
        if len(self.buffer) - self.buf_off < CHUNK_BYTES:
            if self.buf_off:
                del self.buffer[:self.buf_off]
                self.buf_off = 0
            while len(self.buffer) < CHUNK_BYTES:
                chunk = self.file.read(CHUNK_BYTES)
                if not chunk:
                    file_exhausted = True
                    break
                self.buffer += chunk

        if self.buf_off >= len(self.buffer):
            self._finish()
            return pcm.empty_framelist(self.channels,
                                       self.bits_per_sample)

        max_samples = max(pcm_frames, self.maximum_block_size or 65536)
        (samples, consumed) = _native.flac_decode(
            memoryview(self.buffer)[self.buf_off:],
            self.bits_per_sample, self.channels, max_samples,
            md5=self.current_md5)

        if consumed == 0:
            if not file_exhausted:
                # a single frame can straddle the chunk boundary:
                # top up and retry before judging the bytes bad
                chunk = self.file.read(CHUNK_BYTES)
                if chunk:
                    self.buffer += chunk
                    return self.read(pcm_frames)
            # no complete frame in buffer.  Trailing garbage (or a
            # frame that stopped parsing) must NOT pass as EOF — for
            # streams whose STREAMINFO MD5 is zeroed the MD5 check
            # below would never catch the truncation
            if (len(self.buffer) - self.buf_off > 0 and
                    (not self.total_frames or
                     self.decoded_frames < self.total_frames)):
                raise ValueError(
                    "corrupt FLAC stream: undecodable bytes at "
                    "frame %d" % (self.decoded_frames,))
            self._finish()
            return pcm.empty_framelist(self.channels,
                                       self.bits_per_sample)

        self.buf_off += consumed
        # the native decoder returns contiguous interleaved samples and
        # has already folded them into the stream MD5 (fused per frame)
        framelist = pcm.FrameList._wrap(samples, self.bits_per_sample)
        self.decoded_frames += framelist.frames

        if (self.total_frames and
                self.decoded_frames >= self.total_frames):
            self._finish()
        return framelist

    def _finish(self):
        if not self.eof:
            self.eof = True
            if ((self.md5sum != b"\x00" * 16) and
                    (self.current_md5.digest() != self.md5sum)):
                raise ValueError(text.ERR_FLAC_MD5_MISMATCH)

    def seekable(self):
        return not self.closed

    def seek(self, pcm_frame):
        """seeks to the given PCM frame position in the stream

        returns the position actually seeked to, which is at or
        before the requested one (the nearest prior seekpoint, or the
        stream start).  Seeking disables the end-of-stream MD5 check
        (the hash no longer covers every sample), matching the
        reference decoder (src/decoders/flac.c seek path)."""
        if self.closed:
            raise ValueError("stream is closed")
        pcm_frame = max(int(pcm_frame), 0)

        # nearest seekpoint at or before the target
        best = (0, 0)       # (sample_number, byte_offset)
        for (sample_number, byte_offset, _frame_count) in \
                self.seektable:
            if sample_number <= pcm_frame and \
                    sample_number >= best[0]:
                best = (sample_number, byte_offset)

        self.file.seek(self.frames_offset + best[1], 0)
        self.buffer = bytearray()
        self.buf_off = 0
        self.eof = False
        self.decoded_frames = best[0]
        # the stream MD5 covers the whole file; after a partial
        # decode it can no longer be verified
        self.md5sum = b"\x00" * 16

        # decode-and-discard whole frames while they fit before the
        # target (flac_decode never splits frames, so read(block)
        # cannot overshoot)
        remaining = pcm_frame - best[0]
        block = self.maximum_block_size or 4096
        while remaining >= block:
            framelist = self.read(block)
            if framelist.frames == 0:
                break
            remaining -= framelist.frames
        return self.decoded_frames

    def close(self):
        self.closed = True
        self.file.close()
