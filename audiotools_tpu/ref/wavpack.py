"""WavPack codec: reference encoder and decoder.

Re-derivation of the reference WavPack implementation
(``/root/reference/src/decoders/wavpack.c``, ``src/encoders/wavpack.c``
and the pure-Python specs ``audiotools/py_decoders/wavpack.py`` /
``py_encoders/wavpack.py``): block/sub-block structure, 1-16
decorrelation passes with adaptive weights (terms 18/17, 1-8 and the
cross-channel -1/-2/-3 terms), wv_log2/wv_exp2 compressed state storage,
joint stereo, the three-median adaptive entropy coder with
Elias-gamma-coded zero runs, extended (wasted-bit) integers, per-block
CRC and stream MD5.

The log2/exp2 tables are the published WavPack format constants,
generated here from their defining curve round(256 * 2^(i/256)) and its
inverse rather than copied.
"""

from __future__ import annotations

from hashlib import md5

import numpy as np

from .. import pcm
from ..bitstream import BitstreamReader, BitstreamWriter, \
    BitstreamRecorder

(WV_WAVE_HEADER, WV_TERMS, WV_WEIGHTS, WV_SAMPLES, WV_ENTROPY,
 WV_MD5, WV_SAMPLE_RATE) = (0x1, 0x2, 0x3, 0x4, 0x5, 0x6, 0x7)
WV_WAVE_FOOTER = 0x2          # nondecoder function 2
WV_INT32_INFO = 0x9
WV_BITSTREAM = 0xA
WV_CHANNEL_INFO = 0xD

SAMPLE_RATES = [6000, 8000, 9600, 11025, 12000, 16000, 22050, 24000,
                32000, 44100, 48000, 64000, 88200, 96000, 192000]


def _make_exp2_table():
    """EXP2[i] = round(256 * 2^(i/256)) — the format's defining curve"""
    i = np.arange(256)
    return np.round(256.0 * np.exp2(i / 256.0)).astype(np.int64)


def _make_log2_table(exp2_table):
    """WLOG[i]: the inverse curve, log2(1 + i/256) scaled to 256"""
    i = np.arange(256)
    return np.round(256.0 * np.log2(1.0 + i / 256.0)).astype(np.int64)


def _use_native():
    import os
    return os.environ.get("ATPU_WV_ORACLE", "0") != "1"


EXP2_TABLE = _make_exp2_table()
LOG2_TABLE = _make_log2_table(EXP2_TABLE)


def wv_exp2(value):
    """the WavPack 16-bit log-domain to linear conversion"""
    if -32768 <= value < -2304:
        return -int(EXP2_TABLE[-value & 0xFF] << ((-value >> 8) - 9))
    elif -2304 <= value < 0:
        return -int(EXP2_TABLE[-value & 0xFF] >> (9 - (-value >> 8)))
    elif 0 <= value <= 2304:
        return int(EXP2_TABLE[value & 0xFF] >> (9 - (value >> 8)))
    else:
        return int(EXP2_TABLE[value & 0xFF] << ((value >> 8) - 9))


def wv_log2(value):
    """the WavPack linear to 16-bit log-domain conversion"""
    value = int(value)
    a = abs(value) + (abs(value) >> 9)
    c = a.bit_length() if a else 0
    if 0 <= a < 256:
        log_val = (c << 8) + int(LOG2_TABLE[(a << (9 - c)) % 256])
    else:
        log_val = (c << 8) + int(LOG2_TABLE[(a >> (c - 9)) % 256])
    return log_val if value > 0 else (0 if value == 0 else -log_val)


def apply_weight(weight, sample):
    return ((weight * sample) + 512) >> 10


def update_weight(source, result, delta):
    if (source == 0) or (result == 0):
        return 0
    elif (source ^ result) >= 0:
        return delta
    else:
        return -delta


def store_weight(w):
    w = min(max(w, -1024), 1024)
    if w > 0:
        return ((w - ((w + 64) >> 7)) + 4) >> 3
    elif w == 0:
        return 0
    else:
        return (w + 4) >> 3


def restore_weight(v):
    if v > 0:
        return (v << 3) + (((v << 3) + 64) >> 7)
    elif v == 0:
        return 0
    else:
        return v << 3


def calculate_crc(channels):
    """the WavPack per-block sample CRC"""
    if _use_native():
        from .. import _native
        import ctypes
        lib = _native.get_lib()
        lib.atpu_wv_crc.restype = ctypes.c_uint32
        lib.atpu_wv_crc.argtypes = [ctypes.POINTER(ctypes.c_int32),
                                    ctypes.c_int64]
        flat = np.ascontiguousarray(
            np.stack([np.asarray(c, dtype=np.int64)
                      for c in channels], axis=1).reshape(-1)
            .astype(np.int32))
        return int(lib.atpu_wv_crc(
            flat.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            flat.size))
    crc = 0xFFFFFFFF
    for frame in zip(*channels):
        for s in frame:
            crc = (3 * crc + s) & 0xFFFFFFFF
    return crc


def calculate_crc_array(channels):
    """vectorized per-block CRC over [n, ch] int64 samples"""
    flat = np.asarray(channels).T.reshape(-1).astype(object)
    crc = 0xFFFFFFFF
    for s in flat.tolist():
        crc = (3 * crc + s) & 0xFFFFFFFF
    return crc


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

class Block_Header:
    FIELDS = ["block_size", "version", "track_number", "index_number",
              "total_samples", "block_index", "block_samples",
              "bits_per_sample", "mono_output", "hybrid_mode",
              "joint_stereo", "channel_decorrelation",
              "hybrid_noise_shaping", "floating_point_data",
              "extended_size_integers", "hybrid_controls_bitrate",
              "hybrid_noise_balanced", "initial_block", "final_block",
              "left_shift_data", "maximum_magnitude", "sample_rate",
              "use_IIR", "false_stereo", "CRC"]

    def __init__(self, *values):
        if values[0] != b"wvpk":
            raise ValueError("invalid WavPack block ID")
        for (field, value) in zip(self.FIELDS, values[1:]):
            setattr(self, field, value)

    @classmethod
    def read(cls, reader):
        return cls(*reader.parse("4b 32u 16u 8u 8u 32u 32u 32u"
                                 "2u 11* 1u 5u 5u 4u 2p 1u 1u 1p"
                                 "32u"))


class WavPackDecoder:
    """a PCMReader-compatible WavPack stream decoder"""

    def __init__(self, file_or_path):
        if isinstance(file_or_path, str):
            f = open(file_or_path, "rb")
        else:
            f = file_or_path
        self.reader = BitstreamReader(f, True)

        # the stream may start at a nonzero offset of an already-open
        # file object; record it so seek() scans from the WavPack
        # stream's own base, not absolute byte 0
        self._stream_start = self.reader.source.tell()
        self._block_index_cache = None

        # read initial block for stream parameters
        self.reader.mark()
        header = Block_Header.read(self.reader)
        sub_blocks_size = header.block_size - 24
        sub_blocks = self.reader.read_bytes(sub_blocks_size)

        if header.sample_rate != 15:
            self.sample_rate = SAMPLE_RATES[header.sample_rate]
        else:
            for (function, nondecoder, data) in \
                    _walk_sub_blocks(sub_blocks):
                if (function == WV_SAMPLE_RATE) and nondecoder:
                    self.sample_rate = int.from_bytes(data, "little")
                    break
            else:
                raise ValueError("invalid sample rate")

        self.bits_per_sample = [8, 16, 24, 32][header.bits_per_sample]

        if header.initial_block and header.final_block:
            if (header.mono_output == 0) or header.false_stereo:
                self.channels = 2
                self.channel_mask = 0x3
            else:
                self.channels = 1
                self.channel_mask = 0x4
        else:
            for (function, nondecoder, data) in \
                    _walk_sub_blocks(sub_blocks):
                if (function == WV_CHANNEL_INFO) and (nondecoder == 0):
                    self.channels = data[0]
                    self.channel_mask = int.from_bytes(data[1:],
                                                       "little")
                    break
            else:
                raise ValueError("channel mask sub block not found")

        self.total_frames = header.total_samples

        self.reader.rewind()
        self.reader.unmark()

        self.pcm_finished = False
        self.md5_checked = False
        self.md5sum = md5()

    def read(self, pcm_frames):
        if self.pcm_finished:
            if not self.md5_checked:
                # look for an MD5 sub block in the trailing block
                try:
                    self.reader.mark()
                    try:
                        header = Block_Header.read(self.reader)
                        sub_blocks = self.reader.read_bytes(
                            header.block_size - 24)
                        for (function, nondecoder, data) in \
                                _walk_sub_blocks(sub_blocks):
                            if (function == WV_MD5) and nondecoder:
                                if data[:16] != self.md5sum.digest():
                                    raise ValueError(
                                        "invalid stream MD5 sum")
                    except (IOError, ValueError) as err:
                        if "MD5" in str(err):
                            raise
                    finally:
                        self.reader.rewind()
                        self.reader.unmark()
                finally:
                    self.md5_checked = True
            return pcm.empty_framelist(self.channels,
                                       self.bits_per_sample)

        channels = []
        while True:
            try:
                header = Block_Header.read(self.reader)
            except (ValueError, IOError):
                self.pcm_finished = True
                return pcm.empty_framelist(self.channels,
                                           self.bits_per_sample)
            sub_blocks = self.reader.read_bytes(header.block_size - 24)
            channels.extend(_read_block(header, sub_blocks))
            if header.final_block == 1:
                break

        if ((header.block_index + header.block_samples) >=
                header.total_samples):
            self.pcm_finished = True

        out = np.stack([np.asarray(ch, dtype=np.int64)
                        for ch in channels], axis=1)
        framelist = pcm.FrameList._wrap(out.astype(np.int32),
                                        self.bits_per_sample)
        self.md5sum.update(framelist.to_bytes(
            False, self.bits_per_sample > 8))
        return framelist

    def seekable(self):
        return True

    def seek(self, pcm_frame):
        """seeks to the given PCM frame position

        returns the block-aligned position actually seeked to (at or
        before the requested frame).  WavPack blocks decode
        independently — each carries its own decorrelation state and
        block_index — so seeking scans the self-delimiting 32-byte
        block headers (reference decoder's seek strategy,
        src/decoders/wavpack.c) for the last initial block at or
        before the target and repositions there.  Seeking disables
        the end-of-stream MD5 check (it no longer covers every
        sample)."""
        target = max(int(pcm_frame), 0)
        r = self.reader
        if self._block_index_cache is None:
            # one linear scan builds the (block_index, byte offset)
            # table of initial blocks; later seeks reuse it
            index = []
            r.seek(self._stream_start, 0)
            byte_pos = self._stream_start
            while True:
                try:
                    header = Block_Header.read(r)
                except (IOError, ValueError):
                    break
                if header.initial_block:
                    index.append((header.block_index, byte_pos))
                # on-disk block length = block_size + 8 ('wvpk' +
                # size are excluded from the field); 24 header bytes
                # already consumed beyond the first 8
                r.skip_bytes(header.block_size - 24)
                byte_pos += header.block_size + 8
            self._block_index_cache = index
        best = (0, self._stream_start)     # (block_index, byte offset)
        for (block_index, byte_pos) in self._block_index_cache:
            if block_index <= target:
                best = (block_index, byte_pos)
            else:
                break
        r.seek(best[1], 0)
        self.pcm_finished = False
        self.md5_checked = True            # hash no longer complete
        return best[0]

    def close(self):
        self.reader.close()


def _walk_sub_blocks(data):
    """yields (metadata_function, nondecoder_data, data bytes)"""
    pos = 0
    while pos < len(data):
        byte0 = data[pos]
        function = byte0 & 0x1F
        nondecoder = (byte0 >> 5) & 1
        actual_size_1_less = (byte0 >> 6) & 1
        large = (byte0 >> 7) & 1
        if large:
            size = int.from_bytes(data[pos + 1:pos + 4], "little")
            pos += 4
        else:
            size = data[pos + 1]
            pos += 2
        payload = data[pos:pos + size * 2]
        if actual_size_1_less:
            payload = payload[:-1]
        pos += size * 2
        yield (function, nondecoder, payload)


def _read_block(header, sub_blocks):
    """returns a list of 1 or 2 sample lists from one WavPack block"""
    parsed = _parse_block(header, sub_blocks)
    if parsed["terms"]:
        decorrelated = _decorrelate_channels(
            parsed["residuals"], parsed["terms"], parsed["deltas"],
            parsed["weights"], parsed["samples"])
    else:
        decorrelated = parsed["residuals"]
    return _finish_block(header, parsed, decorrelated)


def _parse_block(header, sub_blocks):
    """phase 1 of one-block decode: the sub-block walk + host entropy
    decode, NO decorrelation.  Split out so batched decode paths
    (codecs/wavpack_jax.BatchedWavPackDecoder) can parse many blocks
    ahead and decorrelate them in one device dispatch — WavPack
    blocks decode independently (each carries its own weights/samples
    sub-blocks; reference src/decoders/wavpack.c)."""
    if header.hybrid_mode:
        raise ValueError("hybrid mode not supported")
    if header.floating_point_data:
        raise ValueError("floating point data not supported")

    terms = deltas = weights = samples = entropies = None
    residuals = None
    zero_bits = one_bits = duplicate_bits = 0

    two_ch = (header.mono_output == 0) and (header.false_stereo == 0)

    for (function, nondecoder, data) in _walk_sub_blocks(sub_blocks):
        if nondecoder:
            continue
        reader = BitstreamReader(data, True)
        if function == WV_TERMS:
            terms = []
            deltas = []
            for i in range(len(data)):
                byte = data[i]
                term = (byte & 0x1F) - 5
                if not ((1 <= term <= 18) or (-3 <= term <= -1)):
                    raise ValueError("invalid decorrelation term")
                terms.append(term)
                deltas.append((byte >> 5) & 0x7)
            terms.reverse()
            deltas.reverse()
        elif function == WV_WEIGHTS:
            values = [restore_weight(
                v - 256 if v >= 128 else v) for v in data]
            weights = []
            if two_ch:
                for i in range(len(values) // 2):
                    weights.append([values[i * 2], values[i * 2 + 1]])
                for i in range(len(values) // 2, len(terms)):
                    weights.append([0, 0])
            else:
                for i in range(len(values)):
                    weights.append([values[i]])
                for i in range(len(values), len(terms)):
                    weights.append([0])
            weights.reverse()
        elif function == WV_SAMPLES:
            samples = _read_decorrelation_samples(
                reader, terms, two_ch, len(data))
        elif function == WV_ENTROPY:
            entropies = [[wv_exp2(reader.read_signed(16))
                          for _ in range(3)]]
            if two_ch:
                entropies.append([wv_exp2(reader.read_signed(16))
                                  for _ in range(3)])
            else:
                entropies.append([0, 0, 0])
        elif function == WV_INT32_INFO:
            (_sent, zero_bits, one_bits, duplicate_bits) = data[0:4]
        elif function == WV_BITSTREAM:
            if entropies is None:
                raise ValueError("bitstream before entropy variables")
            residuals = _read_bitstream(reader, header, entropies,
                                        two_ch, raw_data=data)

    if residuals is None:
        raise ValueError("bitstream sub block not found")

    return {"residuals": residuals, "terms": terms, "deltas": deltas,
            "weights": weights, "samples": samples, "two_ch": two_ch,
            "zero_bits": zero_bits, "one_bits": one_bits,
            "duplicate_bits": duplicate_bits}


def _finish_block(header, parsed, decorrelated):
    """phase 2 of one-block decode: joint-stereo undo, CRC check,
    extended-integer restore, false-stereo expansion"""
    two_ch = parsed["two_ch"]
    if two_ch and header.joint_stereo:
        decorrelated = _undo_joint_stereo(decorrelated)

    if calculate_crc(decorrelated) != header.CRC:
        raise ValueError("block CRC mismatch")

    if header.extended_size_integers:
        decorrelated = _undo_extended_integers(
            parsed["zero_bits"], parsed["one_bits"],
            parsed["duplicate_bits"], decorrelated)

    if (not two_ch) and (header.false_stereo == 0):
        return list(decorrelated)
    elif header.false_stereo:
        return [decorrelated[0], decorrelated[0]]
    else:
        return list(decorrelated)


def _read_decorrelation_samples(reader, terms, two_ch, data_bytes):
    """samples[pass][channel][s], matching the stored order"""
    samples = []
    remaining = data_bytes
    for term in reversed(terms):
        if 17 <= term <= 18:
            needed = 8 if two_ch else 4
            if remaining >= needed:
                if two_ch:
                    samples.append(
                        [[wv_exp2(reader.read_signed(16)),
                          wv_exp2(reader.read_signed(16))],
                         [wv_exp2(reader.read_signed(16)),
                          wv_exp2(reader.read_signed(16))]])
                else:
                    samples.append(
                        [[wv_exp2(reader.read_signed(16)),
                          wv_exp2(reader.read_signed(16))]])
                remaining -= needed
            else:
                samples.append([[0, 0], [0, 0]] if two_ch
                               else [[0, 0]])
                remaining = 0
        elif 1 <= term <= 8:
            needed = (term * 4) if two_ch else (term * 2)
            if two_ch:
                term_samples = [[], []]
                if remaining >= needed:
                    for _ in range(term):
                        term_samples[0].append(
                            wv_exp2(reader.read_signed(16)))
                        term_samples[1].append(
                            wv_exp2(reader.read_signed(16)))
                    remaining -= needed
                else:
                    term_samples[0] = [0] * term
                    term_samples[1] = [0] * term
                    remaining = 0
            else:
                term_samples = [[]]
                if remaining >= needed:
                    for _ in range(term):
                        term_samples[0].append(
                            wv_exp2(reader.read_signed(16)))
                    remaining -= needed
                else:
                    term_samples[0] = [0] * term
                    remaining = 0
            samples.append(term_samples)
        elif -3 <= term <= -1:
            if remaining >= 4:
                samples.append([[wv_exp2(reader.read_signed(16))],
                                [wv_exp2(reader.read_signed(16))]])
                remaining -= 4
            else:
                samples.append([[0], [0]])
                remaining = 0
        else:
            raise ValueError("invalid decorrelation term")
    samples.reverse()
    return samples


def _read_egc(reader):
    t = reader.unary(0)
    if t > 0:
        p = reader.read(t - 1)
        return (1 << (t - 1)) + p
    else:
        return t


def _read_residual(reader, last_u, entropies):
    if last_u is None:
        u = reader.unary(0)
        if u == 16:
            u += _read_egc(reader)
        m = u // 2
    elif (last_u % 2) == 1:
        u = reader.unary(0)
        if u == 16:
            u += _read_egc(reader)
        m = (u // 2) + 1
    else:
        u = None
        m = 0

    if m == 0:
        base = 0
        add = entropies[0] >> 4
        entropies[0] -= ((entropies[0] + 126) >> 7) * 2
    elif m == 1:
        base = (entropies[0] >> 4) + 1
        add = entropies[1] >> 4
        entropies[0] += ((entropies[0] + 128) >> 7) * 5
        entropies[1] -= ((entropies[1] + 62) >> 6) * 2
    elif m == 2:
        base = ((entropies[0] >> 4) + 1) + ((entropies[1] >> 4) + 1)
        add = entropies[2] >> 4
        entropies[0] += ((entropies[0] + 128) >> 7) * 5
        entropies[1] += ((entropies[1] + 64) >> 6) * 5
        entropies[2] -= ((entropies[2] + 30) >> 5) * 2
    else:
        base = (((entropies[0] >> 4) + 1) +
                ((entropies[1] >> 4) + 1) +
                (((entropies[2] >> 4) + 1) * (m - 2)))
        add = entropies[2] >> 4
        entropies[0] += ((entropies[0] + 128) >> 7) * 5
        entropies[1] += ((entropies[1] + 64) >> 6) * 5
        entropies[2] += ((entropies[2] + 32) >> 5) * 5

    if add == 0:
        unsigned = base
    else:
        p = add.bit_length() - 1
        e = (1 << (p + 1)) - add - 1
        r = reader.read(p)
        if r >= e:
            b = reader.read(1)
            unsigned = base + (r * 2) - e + b
        else:
            unsigned = base + r

    if reader.read(1):
        return (-unsigned - 1, u)
    else:
        return (unsigned, u)


def _read_bitstream(reader, header, entropies, two_ch,
                    raw_data=None):
    channel_count = 2 if two_ch else 1
    if _use_native() and raw_data is not None:
        from .. import _native
        import ctypes
        lib = _native.get_lib()
        lib.atpu_wv_read_bitstream.restype = ctypes.c_int64
        lib.atpu_wv_read_bitstream.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64)]
        n = header.block_samples
        buf = np.frombuffer(bytes(raw_data), dtype=np.uint8)
        ent = np.asarray(list(entropies[0]) + list(entropies[1]),
                         dtype=np.int64)
        out0 = np.zeros(n, dtype=np.int64)
        out1 = np.zeros(n if channel_count == 2 else 1,
                        dtype=np.int64)
        consumed = lib.atpu_wv_read_bitstream(
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            len(buf), n, channel_count,
            ent.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            out0.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            out1.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        if consumed < 0:
            raise ValueError("bitstream error (code %d)" %
                             (consumed,))
        entropies[0][0:3] = [int(v) for v in ent[0:3]]
        entropies[1][0:3] = [int(v) for v in ent[3:6]]
        if channel_count == 2:
            return [out0, out1]
        return [out0]
    residuals = [[] for _ in range(channel_count)]
    u = None
    i = 0
    total = header.block_samples * channel_count
    while i < total:
        if ((u is None) and (entropies[0][0] < 2) and
                (entropies[1][0] < 2)):
            zeroes = _read_egc(reader)
            if zeroes > 0:
                for _ in range(zeroes):
                    residuals[i % channel_count].append(0)
                    i += 1
                entropies[0][0:3] = [0, 0, 0]
                entropies[1][0:3] = [0, 0, 0]
            if i < total:
                (residual, u) = _read_residual(
                    reader, u, entropies[i % channel_count])
                residuals[i % channel_count].append(residual)
                i += 1
        else:
            (residual, u) = _read_residual(
                reader, u, entropies[i % channel_count])
            residuals[i % channel_count].append(residual)
            i += 1
    return residuals


def _floor_half(x):
    """x / 2 with floor semantics (Python 2 int division)"""
    return x >> 1


def _native_decorrelate(chs, channel_count, term, delta, weights,
                        dec_samples):
    from .. import _native
    import ctypes
    lib = _native.get_lib()
    lib.atpu_wv_decorrelate.restype = ctypes.c_int32
    lib.atpu_wv_decorrelate.argtypes = (
        [ctypes.POINTER(ctypes.c_int64)] * 2 +
        [ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
         ctypes.c_int32] +
        [ctypes.POINTER(ctypes.c_int64)] * 3)

    def ptr(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))

    c0 = np.ascontiguousarray(chs[0], dtype=np.int64)
    c1 = (np.ascontiguousarray(chs[1], dtype=np.int64)
          if channel_count == 2 else np.zeros(1, dtype=np.int64))
    w = np.asarray(list(weights) + [0] * (2 - len(weights)),
                   dtype=np.int64)
    d0 = np.ascontiguousarray(dec_samples[0], dtype=np.int64)
    d1 = (np.ascontiguousarray(dec_samples[1], dtype=np.int64)
          if (channel_count == 2 and len(dec_samples) > 1)
          else np.zeros(max(len(d0), 1), dtype=np.int64))
    rc = lib.atpu_wv_decorrelate(ptr(c0), ptr(c1), len(c0),
                                 channel_count, term, delta,
                                 ptr(w), ptr(d0), ptr(d1))
    if rc != 0:
        raise ValueError("decorrelation error (code %d)" % (rc,))
    return (c0, c1)


def _decorrelation_pass_1ch(correlated, term, delta, weight,
                            dec_samples):
    if _use_native() and (term in (17, 18) or 1 <= term <= 8):
        (c0, _c1) = _native_decorrelate(
            [correlated], 1, term, delta, [weight], [dec_samples])
        return c0
    if term in (17, 18):
        decorrelated = list(dec_samples[::-1])
        for i in range(len(correlated)):
            if term == 18:
                temp = (3 * decorrelated[i + 1] - decorrelated[i]) >> 1
            else:
                temp = 2 * decorrelated[i + 1] - decorrelated[i]
            decorrelated.append(apply_weight(weight, temp) +
                                correlated[i])
            weight += update_weight(temp, correlated[i], delta)
        return decorrelated[2:]
    elif 1 <= term <= 8:
        decorrelated = list(dec_samples)
        for i in range(len(correlated)):
            decorrelated.append(apply_weight(weight, decorrelated[i]) +
                                correlated[i])
            weight += update_weight(decorrelated[i], correlated[i],
                                    delta)
        return decorrelated[term:]
    else:
        raise ValueError("unsupported term")


# device-decode hook: codecs/wavpack_jax.py installs a fused
# decode-chain device program here (the oracle itself never imports
# ops/ — the override is injected from the codecs layer, mirroring
# correlate_channels_override on the encode side)
decorrelate_channels_override = None


def _decorrelate_channels(residuals, terms, deltas, weights,
                          samples_list):
    if decorrelate_channels_override is not None:
        result = decorrelate_channels_override(
            residuals, terms, deltas, weights, samples_list)
        if result is not None:
            return result
    if len(residuals) == 2:
        latest = [r for r in residuals]
        for (term, delta, weight_pair, dec_samples) in zip(
                terms, deltas, weights, samples_list):
            latest = _decorrelation_pass_2ch(latest, term, delta,
                                             weight_pair, dec_samples)
        return latest
    else:
        latest = residuals[0]
        for (term, delta, weight_pair, dec_samples) in zip(
                terms, deltas, weights, samples_list):
            latest = _decorrelation_pass_1ch(latest, term, delta,
                                             weight_pair[0],
                                             dec_samples[0])
        return [latest]


def _decorrelation_pass_2ch(correlated, term, delta, weights,
                            dec_samples):
    if _use_native() and ((-3 <= term <= -1) or (17 <= term <= 18) or
                          (1 <= term <= 8)):
        # one call for both channels: positive-term recurrences are
        # independent, and the kernel runs the two chains interleaved
        (c0, c1) = _native_decorrelate(correlated, 2, term, delta,
                                       weights, dec_samples)
        return [c0, c1]
    if (17 <= term <= 18) or (1 <= term <= 8):
        return [_decorrelation_pass_1ch(correlated[0], term, delta,
                                        weights[0], dec_samples[0]),
                _decorrelation_pass_1ch(correlated[1], term, delta,
                                        weights[1], dec_samples[1])]
    elif -3 <= term <= -1:
        decorrelated = ([dec_samples[1][0]], [dec_samples[0][0]])
        weights = list(weights)
        n = len(correlated[0])
        for i in range(n):
            if term == -1:
                decorrelated[0].append(
                    apply_weight(weights[0], decorrelated[1][i]) +
                    correlated[0][i])
                decorrelated[1].append(
                    apply_weight(weights[1], decorrelated[0][i + 1]) +
                    correlated[1][i])
                weights[0] += update_weight(decorrelated[1][i],
                                            correlated[0][i], delta)
                weights[1] += update_weight(decorrelated[0][i + 1],
                                            correlated[1][i], delta)
            elif term == -2:
                decorrelated[1].append(
                    apply_weight(weights[1], decorrelated[0][i]) +
                    correlated[1][i])
                decorrelated[0].append(
                    apply_weight(weights[0], decorrelated[1][i + 1]) +
                    correlated[0][i])
                weights[1] += update_weight(decorrelated[0][i],
                                            correlated[1][i], delta)
                weights[0] += update_weight(decorrelated[1][i + 1],
                                            correlated[0][i], delta)
            else:  # term == -3
                decorrelated[0].append(
                    apply_weight(weights[0], decorrelated[1][i]) +
                    correlated[0][i])
                decorrelated[1].append(
                    apply_weight(weights[1], decorrelated[0][i]) +
                    correlated[1][i])
                weights[0] += update_weight(decorrelated[1][i],
                                            correlated[0][i], delta)
                weights[1] += update_weight(decorrelated[0][i],
                                            correlated[1][i], delta)
            weights[0] = max(min(weights[0], 1024), -1024)
            weights[1] = max(min(weights[1], 1024), -1024)
        return [decorrelated[0][1:], decorrelated[1][1:]]
    else:
        raise ValueError("unsupported term")


def _undo_joint_stereo(samples):
    mid_arr = np.asarray(samples[0], dtype=np.int64)
    side_arr = np.asarray(samples[1], dtype=np.int64)
    right = side_arr - (mid_arr >> 1)
    left = mid_arr + right
    return [left, right]


def _undo_extended_integers(zero_bits, one_bits, duplicate_bits,
                            channels):
    out = []
    for channel in channels:
        arr = np.asarray(channel, dtype=np.int64)
        if zero_bits:
            arr = arr << zero_bits
        elif one_bits:
            arr = (arr << one_bits) + ((1 << one_bits) - 1)
        elif duplicate_bits:
            ones = (1 << duplicate_bits) - 1
            arr = np.where(arr % 2 == 0,
                           arr << duplicate_bits,
                           (arr << duplicate_bits) + ones)
        out.append(arr)
    return out

# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

class CorrelationParameters:
    """the parameters for a single correlation pass"""

    def __init__(self, term, delta, weights, samples):
        self.term = term
        self.delta = delta
        self.weights = weights
        self.samples = samples

    def update_weights(self, weights):
        self.weights = [restore_weight(store_weight(w))
                        for w in weights]

    def update_samples(self, samples):
        self.samples = [[wv_exp2(wv_log2(s)) for s in c]
                        for c in samples]


# per-pass (term, delta) recipes per correlation pass count
# (reference py_encoders/wavpack.py:176-282; the standard WavPack
# decorrelation filter specs)
_PASS_RECIPES_2CH = {
    0: [],
    1: [(18, 2)],
    2: [(17, 2), (18, 2)],
    5: [(3, 2), (17, 2), (2, 2), (18, 2), (18, 2)],
    10: [(4, 2), (17, 2), (-1, 2), (5, 2), (3, 2), (2, 2), (-2, 2),
         (18, 2), (18, 2), (18, 2)],
    16: [(2, 2), (18, 2), (-1, 2), (8, 2), (6, 2), (3, 2), (5, 2),
         (7, 2), (4, 2), (2, 2), (18, 2), (-2, 2), (3, 2), (2, 2),
         (18, 2), (18, 2)],
}
_PASS_RECIPES_1CH = {
    0: [],
    1: [(18, 2)],
    2: [(17, 2), (18, 2)],
    5: [(3, 2), (17, 2), (2, 2), (18, 2), (18, 2)],
    10: [(3, 2), (17, 2), (2, 2), (18, 2), (18, 2)],
    16: [(3, 2), (17, 2), (2, 2), (18, 2), (18, 2)],
}


def _samples_for_term(term):
    if 17 <= term <= 18:
        return 2
    elif 1 <= term <= 8:
        return term
    else:
        return 1


class EncodingParameters:
    """the encoding parameters for a single 1-2 channel block"""

    def __init__(self, channel_count, correlation_passes):
        self.channel_count = channel_count
        self.correlation_passes = correlation_passes
        self.entropy_variables = [[0, 0, 0], [0, 0, 0]]
        self.__parameters_channel_count__ = 0
        self.__correlation_parameters__ = None

    def correlation_parameters(self, false_stereo):
        """yields a CorrelationParameters object per pass"""
        if (self.channel_count == 2) and (not false_stereo):
            channel_count = 2
            recipes = _PASS_RECIPES_2CH[self.correlation_passes]
        else:
            channel_count = 1
            recipes = _PASS_RECIPES_1CH[self.correlation_passes]

        if channel_count != self.__parameters_channel_count__:
            self.__parameters_channel_count__ = channel_count
            self.__correlation_parameters__ = [
                CorrelationParameters(
                    term, delta,
                    [0] * channel_count,
                    [[0] * _samples_for_term(term)
                     for _ in range(channel_count)])
                for (term, delta) in recipes]

        for parameters in self.__correlation_parameters__:
            yield parameters


def block_parameters(channel_count, channel_mask, correlation_passes):
    """splits a channel layout into 1-2 channel block groups"""
    if channel_count == 1:
        return [EncodingParameters(1, correlation_passes)]
    elif channel_count == 2:
        return [EncodingParameters(2, correlation_passes)]
    elif (channel_count == 3) and (channel_mask == 0x7):
        return [EncodingParameters(2, correlation_passes),
                EncodingParameters(1, correlation_passes)]
    elif (channel_count == 4) and (channel_mask == 0x33):
        return [EncodingParameters(2, correlation_passes),
                EncodingParameters(2, correlation_passes)]
    elif (channel_count == 4) and (channel_mask == 0x107):
        return [EncodingParameters(2, correlation_passes),
                EncodingParameters(1, correlation_passes),
                EncodingParameters(1, correlation_passes)]
    elif (channel_count == 5) and (channel_mask == 0x37):
        return [EncodingParameters(2, correlation_passes),
                EncodingParameters(1, correlation_passes),
                EncodingParameters(2, correlation_passes)]
    elif (channel_count == 6) and (channel_mask == 0x3F):
        return [EncodingParameters(2, correlation_passes),
                EncodingParameters(1, correlation_passes),
                EncodingParameters(1, correlation_passes),
                EncodingParameters(2, correlation_passes)]
    else:
        return [EncodingParameters(1, correlation_passes)
                for _ in range(channel_count)]


class EncoderContext:
    def __init__(self, pcmreader, parameters, wave_header=None,
                 wave_footer=None):
        self.pcmreader = pcmreader
        self.block_parameters = parameters
        self.total_frames = 0
        self.block_offsets = []
        self.md5sum = md5()
        self.first_block_written = False
        self.wave_header = wave_header
        self.wave_footer = wave_footer


def _write_wave_header(writer, pcmreader, total_frames,
                       wave_footer_len):
    """synthesizes the RIFF header stored in the first sub block"""
    from ..formats.wav import build_fmt
    import struct
    fmt = build_fmt(pcmreader.channels, pcmreader.sample_rate,
                    pcmreader.bits_per_sample, pcmreader.channel_mask)
    data_size = (total_frames * pcmreader.channels *
                 (pcmreader.bits_per_sample // 8))
    total_size = (4 + (8 + len(fmt)) + (8 + data_size) +
                  wave_footer_len)
    writer.write_bytes(b"RIFF" + struct.pack("<I", total_size) +
                       b"WAVE" +
                       b"fmt " + struct.pack("<I", len(fmt)) + fmt +
                       b"data" + struct.pack("<I", data_size))


def encode_wavpack(file_or_path,
                   pcmreader,
                   block_size,
                   total_pcm_frames=0,
                   false_stereo=False,
                   wasted_bits=False,
                   joint_stereo=False,
                   correlation_passes=0,
                   wave_header=None,
                   wave_footer=None):
    """encodes a WavPack file from a PCMReader"""
    from ..pcmstream import BufferedPCMReader

    pcmreader = BufferedPCMReader(pcmreader)
    if isinstance(file_or_path, str):
        output_file = open(file_or_path, "wb")
        close_file = True
    else:
        output_file = file_or_path
        close_file = False
    writer = BitstreamWriter(output_file, True)
    context = EncoderContext(pcmreader,
                             block_parameters(pcmreader.channels,
                                              pcmreader.channel_mask,
                                              correlation_passes),
                             wave_header, wave_footer)

    block_index = 0
    frame = pcmreader.read(block_size)
    while len(frame) > 0:
        context.total_frames += frame.frames
        context.md5sum.update(
            frame.to_bytes(False, pcmreader.bits_per_sample >= 16))

        c = 0
        for parameters in context.block_parameters:
            if parameters.channel_count == 1:
                channel_data = [
                    frame.samples[:, c].astype(np.int64)]
            else:
                channel_data = [
                    frame.samples[:, c].astype(np.int64),
                    frame.samples[:, c + 1].astype(np.int64)]
            first_block = parameters is context.block_parameters[0]
            last_block = parameters is context.block_parameters[-1]

            if total_pcm_frames == 0:
                writer.flush()
                context.block_offsets.append(output_file.tell())
            write_block(writer, context, channel_data,
                        total_pcm_frames, block_index, first_block,
                        last_block, parameters)
            c += parameters.channel_count

        block_index += frame.frames
        frame = pcmreader.read(block_size)

    # final block: MD5 sum and optional wave footer
    sub_blocks = BitstreamRecorder(True)
    sub_block = BitstreamRecorder(True)
    sub_block.write_bytes(context.md5sum.digest())
    write_sub_block(sub_blocks, WV_MD5, 1, sub_block)
    if context.wave_footer is not None:
        sub_block.reset()
        sub_block.write_bytes(context.wave_footer)
        write_sub_block(sub_blocks, WV_WAVE_FOOTER, 1, sub_block)

    if total_pcm_frames == 0:
        writer.flush()
        context.block_offsets.append(output_file.tell())
    write_block_header(
        writer, sub_blocks.bytes(),
        (total_pcm_frames if total_pcm_frames > 0 else 0xFFFFFFFF),
        0xFFFFFFFF, 0, pcmreader.bits_per_sample, 1, 0, 0, 0, 1, 1, 0,
        pcmreader.sample_rate, 0, 0xFFFFFFFF)
    sub_blocks.copy(writer)
    writer.flush()

    # update the generated wave header's data chunk size
    if context.wave_header is None:
        output_file.seek(32 + 2)
        header_rec = BitstreamRecorder(True)
        _write_wave_header(header_rec, context.pcmreader,
                           context.total_frames,
                           (len(context.wave_footer)
                            if context.wave_footer is not None else 0))
        output_file.write(header_rec.data())

    # back-patch total samples into streamed block headers
    for block_offset in context.block_offsets:
        output_file.seek(block_offset + 12, 0)
        output_file.write(block_index.to_bytes(4, "little"))

    if close_file:
        output_file.close()
    else:
        output_file.seek(0, 2)


def write_block(writer, context, channels, total_pcm_frames,
                block_index, first_block, last_block, parameters):
    """writes one WavPack block of 1-2 channels"""
    if (len(channels) == 1) or bool(
            np.array_equal(channels[0], channels[1])):
        false_stereo = 0 if len(channels) == 1 else 1
        arr = np.asarray(channels[0], dtype=np.int64)
        magnitude = int(np.abs(arr).max()).bit_length() \
            if arr.size else 0
        nonzero = arr[arr != 0]
        if len(nonzero):
            low = np.bitwise_or.reduce(nonzero)
            wasted = int(low & -low).bit_length() - 1
        else:
            wasted = 0
        if wasted > 0:
            shifted = [arr >> wasted]
        else:
            shifted = [arr]
        crc = calculate_crc(shifted)
    else:
        false_stereo = 0
        arr0 = np.asarray(channels[0], dtype=np.int64)
        arr1 = np.asarray(channels[1], dtype=np.int64)
        magnitude = max(
            int(np.abs(arr0).max()).bit_length() if arr0.size else 0,
            int(np.abs(arr1).max()).bit_length() if arr1.size else 0)
        nonzero = np.concatenate([arr0[arr0 != 0], arr1[arr1 != 0]])
        if len(nonzero):
            low = np.bitwise_or.reduce(nonzero)
            wasted = int(low & -low).bit_length() - 1
        else:
            wasted = 0
        if wasted > 0:
            shifted = [arr0 >> wasted, arr1 >> wasted]
        else:
            shifted = [arr0, arr1]
        crc = calculate_crc(shifted)
        # joint stereo: mid = l - r, side = floor((l + r) / 2)
        (l_arr, r_arr) = (shifted[0], shifted[1])
        mid_side = [l_arr - r_arr, (l_arr + r_arr) >> 1]

    sub_blocks = BitstreamRecorder(True)
    sub_block = BitstreamRecorder(True)

    # first block in file carries the Wave header
    if not context.first_block_written:
        sub_block.reset()
        if context.wave_header is None:
            _write_wave_header(sub_block, context.pcmreader, 0,
                               (len(context.wave_footer)
                                if context.wave_footer is not None
                                else 0))
        else:
            sub_block.write_bytes(context.wave_header)
        write_sub_block(sub_blocks, WV_WAVE_HEADER, 1, sub_block)
        context.first_block_written = True

    if parameters.correlation_passes > 0:
        params = list(parameters.correlation_parameters(false_stereo))
        sub_block.reset()
        for p in params:
            sub_block.write(5, p.term + 5)
            sub_block.write(3, p.delta)
        write_sub_block(sub_blocks, WV_TERMS, 0, sub_block)

        sub_block.reset()
        for p in params:
            for weight in p.weights:
                w = store_weight(weight)
                sub_block.write(8, w & 0xFF)
        write_sub_block(sub_blocks, WV_WEIGHTS, 0, sub_block)

        sub_block.reset()
        channel_count = 2 if ((len(channels) == 2) and
                              (not false_stereo)) else 1
        for p in params:
            _write_correlation_samples(sub_block, p.term, p.samples,
                                       channel_count)
        write_sub_block(sub_blocks, WV_SAMPLES, 0, sub_block)

    if wasted > 0:
        sub_block.reset()
        sub_block.build("8u 8u 8u 8u", (0, wasted, 0, 0))
        write_sub_block(sub_blocks, WV_INT32_INFO, 0, sub_block)

    if context.pcmreader.channels > 2:
        sub_block.reset()
        sub_block.write(8, context.pcmreader.channels)
        sub_block.write(32, int(context.pcmreader.channel_mask))
        write_sub_block(sub_blocks, WV_CHANNEL_INFO, 0, sub_block)

    if context.pcmreader.sample_rate not in SAMPLE_RATES:
        sub_block.reset()
        sub_block.write(32, context.pcmreader.sample_rate)
        write_sub_block(sub_blocks, WV_SAMPLE_RATE, 1, sub_block)

    if (len(channels) == 1) or false_stereo:
        if parameters.correlation_passes > 0:
            correlated = correlate_channels(
                shifted,
                parameters.correlation_parameters(false_stereo), 1)
        else:
            correlated = shifted
    else:
        if parameters.correlation_passes > 0:
            correlated = correlate_channels(
                mid_side,
                parameters.correlation_parameters(false_stereo), 2)
        else:
            correlated = mid_side

    sub_block.reset()
    _write_entropy_variables(sub_block, correlated,
                             parameters.entropy_variables)
    write_sub_block(sub_blocks, WV_ENTROPY, 0, sub_block)

    sub_block.reset()
    write_bitstream(sub_block, correlated,
                    parameters.entropy_variables)
    write_sub_block(sub_blocks, WV_BITSTREAM, 0, sub_block)

    cross_decorrelation = len(
        {-1, -2, -3} &
        {p.term
         for p in parameters.correlation_parameters(false_stereo)}) > 0

    write_block_header(
        writer, sub_blocks.bytes(), total_pcm_frames, block_index,
        len(channels[0]), context.pcmreader.bits_per_sample,
        len(channels),
        1 if ((len(channels) == 2) and (false_stereo == 0)) else 0,
        1 if cross_decorrelation else 0,
        wasted, 1 if first_block else 0, 1 if last_block else 0,
        magnitude, context.pcmreader.sample_rate, false_stereo, crc)
    sub_blocks.copy(writer)

    # round-trip entropy variables like the reference
    parameters.entropy_variables = [
        [wv_exp2(wv_log2(p))
         for p in parameters.entropy_variables[0]],
        [wv_exp2(wv_log2(p))
         for p in parameters.entropy_variables[1]]]


def write_block_header(writer, sub_blocks_size, total_pcm_frames,
                       block_index, block_samples, bits_per_sample,
                       channel_count, joint_stereo,
                       cross_channel_decorrelation, wasted_bps,
                       initial_block, final_block, maximum_magnitude,
                       sample_rate, false_stereo, CRC):
    writer.write_bytes(b"wvpk")
    writer.write(32, sub_blocks_size + 24)
    writer.write(16, 0x0410)
    writer.write(8, 0)
    writer.write(8, 0)
    writer.write(32, total_pcm_frames)
    writer.write(32, block_index)
    writer.write(32, block_samples)
    writer.write(2, (bits_per_sample // 8) - 1)
    writer.write(1, 2 - channel_count)
    writer.write(1, 0)                      # hybrid mode
    writer.write(1, joint_stereo)
    writer.write(1, cross_channel_decorrelation)
    writer.write(1, 0)                      # hybrid noise shaping
    writer.write(1, 0)                      # floating point data
    writer.write(1, 1 if wasted_bps else 0)
    writer.write(1, 0)                      # hybrid controls bitrate
    writer.write(1, 0)                      # hybrid noise balanced
    writer.write(1, initial_block)
    writer.write(1, final_block)
    writer.write(5, 0)                      # left shift data
    writer.write(5, maximum_magnitude)
    writer.write(4, {rate: i for (i, rate) in
                     enumerate(SAMPLE_RATES)}.get(sample_rate, 15))
    writer.write(2, 0)
    writer.write(1, 0)                      # use IIR
    writer.write(1, false_stereo)
    writer.write(1, 0)
    writer.write(32, CRC)


def write_sub_block(writer, function, nondecoder_data, recorder):
    recorder.byte_align()
    actual_size_1_less = recorder.bytes() % 2
    writer.build("5u 1u 1u", (function, nondecoder_data,
                              actual_size_1_less))
    if recorder.bytes() > (255 * 2):
        writer.write(1, 1)
        writer.write(24, (recorder.bytes() // 2) + actual_size_1_less)
    else:
        writer.write(1, 0)
        writer.write(8, (recorder.bytes() // 2) + actual_size_1_less)
    recorder.copy(writer)
    if actual_size_1_less:
        writer.write(8, 0)


def _write_correlation_samples(writer, term, samples, channel_count):
    if channel_count == 2:
        if 17 <= term <= 18:
            for v in [samples[0][0], samples[0][1],
                      samples[1][0], samples[1][1]]:
                writer.write_signed(16, wv_log2(v))
        elif 1 <= term <= 8:
            for s in range(term):
                writer.write_signed(16, wv_log2(samples[0][s]))
                writer.write_signed(16, wv_log2(samples[1][s]))
        elif -3 <= term <= -1:
            writer.write_signed(16, wv_log2(samples[0][0]))
            writer.write_signed(16, wv_log2(samples[1][0]))
        else:
            raise ValueError("invalid correlation term")
    else:
        if 17 <= term <= 18:
            writer.write_signed(16, wv_log2(samples[0][0]))
            writer.write_signed(16, wv_log2(samples[0][1]))
        elif 1 <= term <= 8:
            for s in range(term):
                writer.write_signed(16, wv_log2(samples[0][s]))
        else:
            raise ValueError("invalid correlation term")


# device-analysis hook: codecs/wavpack_jax.py installs a batched-scan
# implementation of the whole pass chain (one jitted device program
# per block) when ATPU_WV_BACKEND=jax.  The oracle itself never
# imports ops/ — the override is injected from the codecs layer.
correlate_channels_override = None


def correlate_channels(uncorrelated, correlation_parameters,
                       channel_count):
    """runs all correlation passes, updating parameters in place"""
    params = list(correlation_parameters)
    if correlate_channels_override is not None:
        result = correlate_channels_override(
            uncorrelated, params, channel_count)
        if result is not None:
            return result
    if channel_count == 1:
        latest = uncorrelated[0]
        for p in params:
            (latest, weight, samples) = correlation_pass_1ch(
                latest, p.term, p.delta, p.weights[0], p.samples[0])
            p.update_weights([weight])
            p.update_samples([samples])
        return [latest]
    else:
        latest = uncorrelated
        for p in params:
            (latest, weights, samples) = correlation_pass_2ch(
                latest, p.term, p.delta, p.weights, p.samples)
            p.update_weights(weights)
            p.update_samples(samples)
        return latest


def _native_correlate(ch_arrays, channel_count, term, delta,
                      weights, corr_samples):
    """runs one decorrelation pass via the native kernel

    returns (channels, weights, samples) with oracle semantics"""
    from .. import _native
    import ctypes
    lib = _native.get_lib()
    lib.atpu_wv_correlate.restype = ctypes.c_int32
    lib.atpu_wv_correlate.argtypes = (
        [ctypes.POINTER(ctypes.c_int64)] * 2 +
        [ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
         ctypes.c_int32] +
        [ctypes.POINTER(ctypes.c_int64)] * 3)

    def ptr(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))

    c0 = np.ascontiguousarray(ch_arrays[0], dtype=np.int64)
    c1 = (np.ascontiguousarray(ch_arrays[1], dtype=np.int64)
          if channel_count == 2 else np.zeros(1, dtype=np.int64))
    w = np.asarray(list(weights) + [0] * (2 - len(weights)),
                   dtype=np.int64)
    h0 = np.ascontiguousarray(corr_samples[0], dtype=np.int64)
    h1 = (np.ascontiguousarray(corr_samples[1], dtype=np.int64)
          if channel_count == 2 else np.zeros(max(len(h0), 1),
                                              dtype=np.int64))
    rc = lib.atpu_wv_correlate(ptr(c0), ptr(c1), len(c0),
                               channel_count, term, delta,
                               ptr(w), ptr(h0), ptr(h1))
    if rc != 0:
        raise ValueError("decorrelation error (code %d)" % (rc,))
    if channel_count == 1:
        return ([c0], [int(w[0])], [h0])
    return ([c0, c1], [int(w[0]), int(w[1])], [h0, h1])


def correlation_pass_1ch(uncorrelated, term, delta, weight,
                         correlation_samples):
    if _use_native():
        (chs, ws, samps) = _native_correlate(
            [uncorrelated], 1, term, delta, [weight],
            [correlation_samples])
        return (chs[0], ws[0], samps[0])
    if term in (17, 18):
        full = [correlation_samples[1],
                correlation_samples[0]] + list(uncorrelated)
        correlated = []
        for i in range(2, len(full)):
            if term == 18:
                temp = (3 * full[i - 1] - full[i - 2]) >> 1
            else:
                temp = 2 * full[i - 1] - full[i - 2]
            correlated.append(full[i] - apply_weight(weight, temp))
            weight += update_weight(temp, correlated[i - 2], delta)
        return (correlated, weight, list(reversed(correlated[-2:])))
    elif 1 <= term <= 8:
        full = list(correlation_samples) + list(uncorrelated)
        correlated = []
        for i in range(term, len(full)):
            correlated.append(full[i] -
                              apply_weight(weight, full[i - term]))
            weight += update_weight(full[i - term],
                                    correlated[i - term], delta)
        return (correlated, weight, correlated[-term:])
    else:
        raise ValueError("unsupported term")


def correlation_pass_2ch(uncorrelated, term, delta, weights,
                         correlation_samples):
    if _use_native() and (-3 <= term <= -1):
        (chs, ws, _samps) = _native_correlate(
            uncorrelated, 2, term, delta, weights,
            correlation_samples)
        # negative terms keep their original correlation samples
        return ([chs[0], chs[1]], ws, correlation_samples)
    if (17 <= term <= 18) or (1 <= term <= 8):
        (un1, w1, s1) = correlation_pass_1ch(
            uncorrelated[0], term, delta, weights[0],
            correlation_samples[0])
        (un2, w2, s2) = correlation_pass_1ch(
            uncorrelated[1], term, delta, weights[1],
            correlation_samples[1])
        return ([un1, un2], [w1, w2], [s1, s2])
    elif -3 <= term <= -1:
        full = (list(correlation_samples[1]) + list(uncorrelated[0]),
                list(correlation_samples[0]) + list(uncorrelated[1]))
        correlated = [[], []]
        weights = list(weights)
        for i in range(1, len(full[0])):
            if term == -1:
                correlated[0].append(full[0][i] -
                                     apply_weight(weights[0],
                                                  full[1][i - 1]))
                correlated[1].append(full[1][i] -
                                     apply_weight(weights[1],
                                                  full[0][i]))
                weights[0] += update_weight(full[1][i - 1],
                                            correlated[0][-1], delta)
                weights[1] += update_weight(full[0][i],
                                            correlated[1][-1], delta)
            elif term == -2:
                correlated[0].append(full[0][i] -
                                     apply_weight(weights[0],
                                                  full[1][i]))
                correlated[1].append(full[1][i] -
                                     apply_weight(weights[1],
                                                  full[0][i - 1]))
                weights[0] += update_weight(full[1][i],
                                            correlated[0][-1], delta)
                weights[1] += update_weight(full[0][i - 1],
                                            correlated[1][-1], delta)
            else:  # term == -3
                correlated[0].append(full[0][i] -
                                     apply_weight(weights[0],
                                                  full[1][i - 1]))
                correlated[1].append(full[1][i] -
                                     apply_weight(weights[1],
                                                  full[0][i - 1]))
                weights[0] += update_weight(full[1][i - 1],
                                            correlated[0][-1], delta)
                weights[1] += update_weight(full[0][i - 1],
                                            correlated[1][-1], delta)
            weights[0] = max(min(weights[0], 1024), -1024)
            weights[1] = max(min(weights[1], 1024), -1024)
        return (correlated, weights, correlation_samples)
    else:
        raise ValueError("unsupported term")


def _write_entropy_variables(writer, channels, entropies):
    for e in entropies[0]:
        writer.write(16, wv_log2(e) & 0xFFFF)
    if len(channels) == 2:
        for e in entropies[1]:
            writer.write(16, wv_log2(e) & 0xFFFF)


def _write_egc(writer, value):
    if value > 1:
        t = value.bit_length()
        writer.unary(0, t)
        writer.write(t - 1, value % (1 << (t - 1)))
    else:
        writer.unary(0, value)


class _Residual:
    __slots__ = ("zeroes", "m", "offset", "add", "sign")

    def __init__(self, zeroes, m, offset, add, sign):
        self.zeroes = zeroes
        self.m = m
        self.offset = offset
        self.add = add
        self.sign = sign

    @classmethod
    def encode(cls, residual, entropy):
        if residual >= 0:
            unsigned = residual
            sign = 0
        else:
            unsigned = -residual - 1
            sign = 1

        medians = [(e >> 4) + 1 for e in entropy]

        if unsigned < medians[0]:
            m = 0
            offset = unsigned
            add = medians[0] - 1
            entropy[0] -= ((entropy[0] + 126) >> 7) * 2
        elif (unsigned - medians[0]) < medians[1]:
            m = 1
            offset = unsigned - medians[0]
            add = medians[1] - 1
            entropy[0] += ((entropy[0] + 128) >> 7) * 5
            entropy[1] -= ((entropy[1] + 62) >> 6) * 2
        elif (unsigned - (medians[0] + medians[1])) < medians[2]:
            m = 2
            offset = unsigned - (medians[0] + medians[1])
            add = medians[2] - 1
            entropy[0] += ((entropy[0] + 128) >> 7) * 5
            entropy[1] += ((entropy[1] + 64) >> 6) * 5
            entropy[2] -= ((entropy[2] + 30) >> 5) * 2
        else:
            m = (((unsigned - (medians[0] + medians[1])) //
                  medians[2]) + 2)
            offset = (unsigned -
                      (medians[0] + medians[1] +
                       ((m - 2) * medians[2])))
            add = medians[2] - 1
            entropy[0] += ((entropy[0] + 128) >> 7) * 5
            entropy[1] += ((entropy[1] + 64) >> 6) * 5
            entropy[2] += ((entropy[2] + 32) >> 5) * 5

        return cls(zeroes=None, m=m, offset=offset, add=add, sign=sign)

    def flush(self, writer, u_i_2, m_i):
        """encodes residual_{i-1} given u_{i-2} and m_{i}"""
        if self.zeroes is not None:
            _write_egc(writer, self.zeroes)

        if self.m is not None:
            if (self.m > 0) and (m_i > 0):
                if (u_i_2 is None) or (u_i_2 % 2 == 0):
                    u_i_1 = (self.m * 2) + 1
                else:
                    u_i_1 = (self.m * 2) - 1
            elif (self.m == 0) and (m_i > 0):
                if (u_i_2 is None) or (u_i_2 % 2 == 1):
                    u_i_1 = 1
                else:
                    u_i_1 = None
            elif (self.m > 0) and (m_i == 0):
                if (u_i_2 is None) or (u_i_2 % 2 == 0):
                    u_i_1 = self.m * 2
                else:
                    u_i_1 = (self.m - 1) * 2
            elif (self.m == 0) and (m_i == 0):
                if (u_i_2 is None) or (u_i_2 % 2 == 1):
                    u_i_1 = 0
                else:
                    u_i_1 = None
            else:
                raise ValueError("invalid m")

            if u_i_1 is not None:
                if u_i_1 < 16:
                    writer.unary(0, u_i_1)
                else:
                    writer.unary(0, 16)
                    _write_egc(writer, u_i_1 - 16)

            if self.add > 0:
                p = self.add.bit_length() - 1
                e = (1 << (p + 1)) - self.add - 1
                if self.offset < e:
                    writer.write(p, self.offset)
                else:
                    writer.write(p, (self.offset + e) // 2)
                    writer.write(1, (self.offset + e) % 2)

            writer.write(1, self.sign)
        else:
            u_i_1 = None

        return u_i_1


def _unary_undefined(prev_u, m):
    if m is None:
        return True
    if (m == 0) and (prev_u is not None) and (prev_u % 2 == 0):
        return True
    return False


def write_bitstream(writer, channels, entropies):
    if _use_native():
        from .. import _native
        import ctypes
        lib = _native.get_lib()
        lib.atpu_wv_write_bitstream.restype = ctypes.c_int64
        lib.atpu_wv_write_bitstream.argtypes = (
            [ctypes.POINTER(ctypes.c_int64)] * 2 +
            [ctypes.c_int64, ctypes.c_int32,
             ctypes.POINTER(ctypes.c_int64),
             ctypes.POINTER(ctypes.c_uint8)])
        ch = len(channels)
        c0 = np.ascontiguousarray(channels[0], dtype=np.int64)
        c1 = (np.ascontiguousarray(channels[1], dtype=np.int64)
              if ch == 2 else np.zeros(1, dtype=np.int64))
        ent = np.asarray(list(entropies[0]) + list(entropies[1]),
                         dtype=np.int64)
        out = np.empty(len(c0) * 64 * ch + 1024, dtype=np.uint8)
        total = lib.atpu_wv_write_bitstream(
            c0.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            c1.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(c0), ch,
            ent.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        if total < 0:
            raise ValueError("bitstream error (code %d)" % (total,))
        entropies[0][0:3] = [int(v) for v in ent[0:3]]
        entropies[1][0:3] = [int(v) for v in ent[3:6]]
        writer.write_bytes(out[:total].tobytes())
        return
    r_i_1 = _Residual(zeroes=None, m=None, offset=None, add=None,
                      sign=None)
    u_i_2 = None
    i = 0
    channel_count = len(channels)
    total = channel_count * len(channels[0])

    while i < total:
        r = channels[i % channel_count][i // channel_count]

        if ((entropies[0][0] < 2) and (entropies[1][0] < 2) and
                _unary_undefined(u_i_2, r_i_1.m)):
            if (r_i_1.zeroes is not None) and (r_i_1.m is None):
                # in a block of zeroes
                if r == 0:
                    r_i_1.zeroes += 1
                else:
                    r_i = _Residual.encode(r,
                                           entropies[i % channel_count])
                    r_i.zeroes = r_i_1.zeroes
                    r_i_1 = r_i
            else:
                if r == 0:
                    r_i = _Residual(zeroes=1, m=None, offset=None,
                                    add=None, sign=None)
                    u_i_2 = r_i_1.flush(writer, u_i_2, 0)
                    entropies[0][0:3] = [0, 0, 0]
                    entropies[1][0:3] = [0, 0, 0]
                    r_i_1 = r_i
                else:
                    r_i = _Residual.encode(r,
                                           entropies[i % channel_count])
                    r_i.zeroes = 0
                    u_i_2 = r_i_1.flush(writer, u_i_2, r_i.m)
                    r_i_1 = r_i
        else:
            r_i = _Residual.encode(r, entropies[i % channel_count])
            r_i.zeroes = None
            u_i_2 = r_i_1.flush(writer, u_i_2, r_i.m)
            r_i_1 = r_i

        i += 1

    r_i_1.flush(writer, u_i_2, 0)
