"""Scalar reference FLAC encoder (NumPy) — the differential-test oracle.

Behavioral equivalent of the reference encoder
(``/root/reference/src/encoders/flac.c:43`` and its exact pure-Python spec
``audiotools/py_encoders/flac.py:95``), re-derived with NumPy inner loops
but identical decision semantics:

* mid = floor((L+R)/2), side = L-R channel variants
* per-subframe wasted-bits detection and constant detection
* FIXED order selection by absolute-error sums over diff orders 0-4
  (py_encoders/flac.py:449-469: error sums skip the first 4-order items)
* LPC: tukey(0.5) window -> autocorrelation (float64) -> Levinson-Durbin
  -> order estimate (log-domain, py_encoders/flac.py:676) or exhaustive
  search over all orders -> coefficient quantization with error feedback
  (py_encoders/flac.py:702)
* Rice partition search over partition orders 0..max where
  block_size % 2^porder == 0, parameter from the abs-sum threshold loop
  (py_encoders/flac.py:538), sizes counted as 4 + partition bits
* channel assignment chosen by the reference's exact comparison chain
  (py_encoders/flac.py:196-226)
* verbatim-vs-fixed-vs-LPC comparison including the reference's
  bps*n verbatim estimate quirk (py_encoders/flac.py:411)

The bit serialization uses token (value, nbits) arrays packed MSB-first;
unary codes become single tokens with implicit leading zeros.
"""

from __future__ import annotations

from hashlib import md5

import numpy as np

from .crc import CRC8_TABLE, CRC16_TABLE

FIXED_COEFFS = {0: [],
                1: [1],
                2: [2, -1],
                3: [3, -3, 1],
                4: [4, -6, 4, -1]}


class EncodingOptions:
    """FLAC encoding parameters (reference py_encoders/flac.py:65)"""

    def __init__(self, block_size=4096, max_lpc_order=8,
                 adaptive_mid_side=False, mid_side=True,
                 exhaustive_model_search=False,
                 min_residual_partition_order=0,
                 max_residual_partition_order=5,
                 max_rice_parameter=14,
                 disable_verbatim_subframes=False,
                 disable_constant_subframes=False,
                 disable_fixed_subframes=False,
                 disable_lpc_subframes=False):
        self.block_size = block_size
        self.max_lpc_order = max_lpc_order
        self.adaptive_mid_side = adaptive_mid_side
        self.mid_side = mid_side
        self.exhaustive_model_search = exhaustive_model_search
        self.min_residual_partition_order = min_residual_partition_order
        self.max_residual_partition_order = max_residual_partition_order
        self.max_rice_parameter = max_rice_parameter
        self.disable_verbatim_subframes = disable_verbatim_subframes
        self.disable_constant_subframes = disable_constant_subframes
        self.disable_fixed_subframes = disable_fixed_subframes
        self.disable_lpc_subframes = disable_lpc_subframes

        # qlp precision from block size (reference py_encoders/flac.py:79)
        if block_size <= 192:
            self.qlp_precision = 7
        elif block_size <= 384:
            self.qlp_precision = 8
        elif block_size <= 576:
            self.qlp_precision = 9
        elif block_size <= 1152:
            self.qlp_precision = 10
        elif block_size <= 2304:
            self.qlp_precision = 11
        elif block_size <= 4608:
            self.qlp_precision = 12
        else:
            self.qlp_precision = 13


class TokenStream:
    """accumulates (value, nbits) big-endian bit tokens

    unary-coded values are single tokens whose leading zeros are implicit
    (nbits may exceed the payload's significant bits)
    """

    def __init__(self):
        self.values = []
        self.nbits = []
        self._bits = 0

    def write(self, nbits, value):
        assert value >= 0 and (value >> nbits) == 0
        self.values.append(value)
        self.nbits.append(nbits)
        self._bits += nbits

    def write_signed(self, nbits, value):
        limit = 1 << (nbits - 1)
        assert -limit <= value < limit
        self.write(nbits, value + (1 << nbits) if value < 0 else value)

    def unary(self, value):
        """writes value zero bits then a 1 bit (FLAC rice MSB form)"""
        self.values.append(1)
        self.nbits.append(value + 1)
        self._bits += value + 1

    def extend(self, other):
        self.values.extend(other.values)
        self.nbits.extend(other.nbits)
        self._bits += other._bits

    def extend_arrays(self, values, nbits):
        self.values.extend(values.tolist())
        self.nbits.extend(nbits.tolist())
        self._bits += int(np.sum(nbits))

    def bits(self):
        return self._bits

    def to_bytes(self):
        """packs the tokens MSB-first, zero-padding to a byte boundary"""
        return pack_tokens(self.values, self.nbits)


def pack_tokens(values, nbits):
    """packs (value, nbits) tokens MSB-first into bytes (zero-padded)"""
    # build one big integer; Python bignum shifts are fast enough
    # for the oracle (the production path uses the C++ packer)
    acc = 1  # sentinel top bit to preserve leading zeros
    for (v, n) in zip(values, nbits):
        acc = (acc << n) | v
    total_bits = acc.bit_length() - 1
    pad = (-total_bits) % 8
    acc <<= pad
    total_bits += pad
    data = acc.to_bytes((total_bits // 8) + 1, "big")[1:]
    return data


def crc8(data):
    value = 0
    table = CRC8_TABLE
    for byte in data:
        value = int(table[value ^ byte])
    return value


def crc16(data):
    value = 0
    table = CRC16_TABLE
    for byte in data:
        value = int(table[(value >> 8) ^ byte] ^ ((value << 8) & 0xFFFF))
    return value


def encode_flac(file_or_path,
                pcmreader,
                block_size=4096,
                max_lpc_order=8,
                min_residual_partition_order=0,
                max_residual_partition_order=5,
                mid_side=True,
                adaptive_mid_side=False,
                exhaustive_model_search=False,
                disable_verbatim_subframes=False,
                disable_constant_subframes=False,
                disable_fixed_subframes=False,
                disable_lpc_subframes=False,
                padding_bytes=None):
    """encodes a FLAC file from a PCMReader

    returns a list of (byte_offset, pcm_frames) pairs per FLAC frame
    for building seektables (reference src/encoders/flac.c:73)
    """
    from ..pcmstream import BufferedPCMReader

    options = EncodingOptions(
        block_size, max_lpc_order,
        adaptive_mid_side, mid_side, exhaustive_model_search,
        min_residual_partition_order, max_residual_partition_order,
        14 if pcmreader.bits_per_sample <= 16 else 30,
        disable_verbatim_subframes, disable_constant_subframes,
        disable_fixed_subframes, disable_lpc_subframes)

    if isinstance(file_or_path, str):
        output_file = open(file_or_path, "wb")
        close_file = True
    else:
        output_file = file_or_path
        close_file = False

    streaminfo = dict(minimum_frame_size=(2 ** 24) - 1,
                      maximum_frame_size=0,
                      total_pcm_frames=0,
                      md5=md5())

    pcmreader = BufferedPCMReader(pcmreader)

    # placeholder STREAMINFO (rewritten at the end)
    output_file.write(b"fLaC")
    header_tokens = TokenStream()
    header_tokens.write(1, 1 if padding_bytes is None else 0)
    header_tokens.write(7, 0)
    header_tokens.write(24, 34)
    output_file.write(header_tokens.to_bytes())
    streaminfo_offset = output_file.tell()
    output_file.write(b"\x00" * 34)
    if padding_bytes is not None:
        pad = TokenStream()
        pad.write(1, 1)
        pad.write(7, 1)
        pad.write(24, padding_bytes)
        output_file.write(pad.to_bytes())
        output_file.write(b"\x00" * padding_bytes)

    frame_offsets = []
    current_offset = 0
    frame_number = 0

    frame = pcmreader.read(block_size)
    while len(frame) > 0:
        frame_offsets.append((current_offset, frame.frames))
        streaminfo["total_pcm_frames"] += frame.frames
        streaminfo["md5"].update(frame.to_bytes(False, True))

        frame_bytes = encode_frame(pcmreader, options, frame_number,
                                   frame.samples.astype(np.int64))
        current_offset += len(frame_bytes)
        streaminfo["minimum_frame_size"] = min(
            streaminfo["minimum_frame_size"], len(frame_bytes))
        streaminfo["maximum_frame_size"] = max(
            streaminfo["maximum_frame_size"], len(frame_bytes))
        output_file.write(frame_bytes)

        frame_number += 1
        frame = pcmreader.read(block_size)

    # rewrite STREAMINFO with final values
    output_file.seek(streaminfo_offset, 0)
    output_file.write(build_streaminfo(
        block_size, block_size,
        streaminfo["minimum_frame_size"],
        streaminfo["maximum_frame_size"],
        pcmreader.sample_rate,
        pcmreader.channels,
        pcmreader.bits_per_sample,
        streaminfo["total_pcm_frames"],
        streaminfo["md5"].digest()))
    if close_file:
        output_file.close()
    else:
        output_file.seek(0, 2)

    return frame_offsets


def build_streaminfo(minimum_block_size, maximum_block_size,
                     minimum_frame_size, maximum_frame_size,
                     sample_rate, channels, bits_per_sample,
                     total_pcm_frames, md5sum):
    """returns the 34-byte STREAMINFO block body"""
    t = TokenStream()
    t.write(16, minimum_block_size)
    t.write(16, maximum_block_size)
    t.write(24, minimum_frame_size)
    t.write(24, maximum_frame_size)
    t.write(20, sample_rate)
    t.write(3, channels - 1)
    t.write(5, bits_per_sample - 1)
    t.write(36, total_pcm_frames)
    data = t.to_bytes()
    return data + md5sum


def encode_frame(pcmreader, options, frame_number, samples):
    """encodes one FLAC frame, returning its bytes

    samples is an int64 [frames, channels] array"""
    bps = pcmreader.bits_per_sample

    if (samples.shape[1] == 2) and (options.adaptive_mid_side or
                                    options.mid_side):
        left = samples[:, 0]
        right = samples[:, 1]
        average = (left + right) >> 1    # floor division == Py2 int "/2"
        difference = left - right

        left_sub = encode_subframe(options, bps, left)
        right_sub = encode_subframe(options, bps, right)
        average_sub = encode_subframe(options, bps, average)
        difference_sub = encode_subframe(options, bps + 1, difference)

        lb, rb = left_sub.bits(), right_sub.bits()
        ab, db = average_sub.bits(), difference_sub.bits()

        if options.mid_side:
            if (lb + rb) < min(lb + db, db + rb, ab + db):
                assignment, subframes = 0x1, [left_sub, right_sub]
            elif lb < min(rb, db):
                assignment, subframes = 0x8, [left_sub, difference_sub]
            elif rb < ab:
                assignment, subframes = 0x9, [difference_sub, right_sub]
            else:
                assignment, subframes = 0xA, [average_sub, difference_sub]
        else:
            if (lb + rb) < (ab + db):
                assignment, subframes = 0x1, [left_sub, right_sub]
            else:
                assignment, subframes = 0xA, [average_sub, difference_sub]
    else:
        assignment = samples.shape[1] - 1
        subframes = [encode_subframe(options, bps, samples[:, i])
                     for i in range(samples.shape[1])]

    header = frame_header_tokens(pcmreader, frame_number,
                                 samples.shape[0], assignment)
    header_bytes = header.to_bytes()
    header_bytes += bytes([crc8(header_bytes)])

    body = TokenStream()
    for sub in subframes:
        body.extend(sub)
    body_bytes = body.to_bytes()

    frame = header_bytes + body_bytes
    return frame + crc16(frame).to_bytes(2, "big")


def frame_header_tokens(pcmreader, frame_number, block_size, assignment):
    """builds the frame header token stream (minus CRC-8)"""
    t = TokenStream()
    t.write(14, 0x3FFE)
    t.write(1, 0)
    t.write(1, 0)

    encoded_block_size = {192: 1, 256: 8, 512: 9, 576: 2,
                          1024: 10, 1152: 3, 2048: 11, 2304: 4,
                          4096: 12, 4608: 5, 8192: 13, 16384: 14,
                          32768: 15}.get(block_size)
    if encoded_block_size is None:
        if block_size <= 256:
            encoded_block_size = 6
        elif block_size <= 65536:
            encoded_block_size = 7
        else:
            encoded_block_size = 0
    t.write(4, encoded_block_size)

    encoded_sample_rate = {8000: 4, 16000: 5, 22050: 6, 24000: 7,
                           32000: 8, 44100: 9, 48000: 10, 88200: 1,
                           96000: 11, 176400: 2, 192000: 3}.get(
                               pcmreader.sample_rate)
    if encoded_sample_rate is None:
        if ((pcmreader.sample_rate % 1000 == 0) and
                (pcmreader.sample_rate <= 255000)):
            encoded_sample_rate = 12
        elif ((pcmreader.sample_rate % 10 == 0) and
                (pcmreader.sample_rate <= 655350)):
            encoded_sample_rate = 14
        elif pcmreader.sample_rate <= 65535:
            encoded_sample_rate = 13
        else:
            encoded_sample_rate = 0
    t.write(4, encoded_sample_rate)

    t.write(4, assignment)

    t.write(3, {8: 1, 12: 2, 16: 4, 20: 5, 24: 6}.get(
        pcmreader.bits_per_sample, 0))
    t.write(1, 0)

    write_utf8(t, frame_number)

    if encoded_block_size == 6:
        t.write(8, block_size - 1)
    elif encoded_block_size == 7:
        t.write(16, block_size - 1)

    if encoded_sample_rate == 12:
        t.write(8, pcmreader.sample_rate % 1000)
    elif encoded_sample_rate == 13:
        t.write(16, pcmreader.sample_rate)
    elif encoded_sample_rate == 14:
        t.write(16, pcmreader.sample_rate % 10)

    return t


def write_utf8(t, value):
    """writes a UTF-8 encoded frame number to a TokenStream"""
    if value <= 127:
        t.write(8, value)
    else:
        if value <= 2047:
            total_bytes = 2
        elif value <= 65535:
            total_bytes = 3
        elif value <= 2097151:
            total_bytes = 4
        elif value <= 67108863:
            total_bytes = 5
        elif value <= 2147483647:
            total_bytes = 6
        else:
            raise ValueError("UTF-8 value too large")

        shift = (total_bytes - 1) * 6
        # total_bytes 1-bits then a 0 bit
        t.write(total_bytes + 1, ((1 << total_bytes) - 1) << 1)
        t.write(7 - total_bytes, value >> shift)
        shift -= 6
        while shift >= 0:
            t.write(2, 2)
            t.write(6, (value >> shift) & 0x3F)
            shift -= 6


def encode_subframe(options, bits_per_sample, samples):
    """encodes one subframe, returning a TokenStream

    samples is an int64 1-D array (already decorrelated)"""
    if np.all(samples == samples[0]):
        return constant_subframe(bits_per_sample, int(samples[0]))

    # wasted bits: min trailing zero count over nonzero samples
    nonzero = samples[samples != 0]
    if len(nonzero) == 0:
        wasted_bps = 0
    else:
        # trailing zeros of |x|: x & -x isolates lowest set bit
        low_bit = (nonzero & -nonzero).astype(np.uint64)
        wasted_bps = int(np.log2(low_bit.min()))
    if wasted_bps > 0:
        samples = samples >> wasted_bps

    fixed = fixed_subframe(options, wasted_bps, bits_per_sample, samples)

    if options.max_lpc_order > 0:
        (lpc_order, qlp_coeffs, qlp_shift) = compute_lpc_coefficients(
            options, wasted_bps, bits_per_sample, samples)
        lpc = lpc_subframe(options, wasted_bps, bits_per_sample,
                           lpc_order, options.qlp_precision,
                           qlp_shift, qlp_coeffs, samples)
        if ((bits_per_sample * len(samples)) <
                min(fixed.bits(), lpc.bits())):
            return verbatim_subframe(wasted_bps, bits_per_sample, samples)
        elif fixed.bits() < lpc.bits():
            return fixed
        else:
            return lpc
    else:
        if (bits_per_sample * len(samples)) < fixed.bits():
            return verbatim_subframe(wasted_bps, bits_per_sample, samples)
        else:
            return fixed


def constant_subframe(bits_per_sample, sample):
    t = TokenStream()
    t.write(1, 0)
    t.write(6, 0)
    t.write(1, 0)
    t.write_signed(bits_per_sample, sample)
    return t


def write_wasted(t, wasted_bps):
    if wasted_bps > 0:
        t.write(1, 1)
        # unary with stop bit 1: (wasted_bps - 1) zeros then a 1
        t.unary(wasted_bps - 1)
    else:
        t.write(1, 0)


def verbatim_subframe(wasted_bps, bits_per_sample, samples):
    t = TokenStream()
    t.write(1, 0)
    t.write(6, 1)
    write_wasted(t, wasted_bps)
    nbits = bits_per_sample - wasted_bps
    vals = np.where(samples < 0, samples + (1 << nbits), samples)
    t.extend_arrays(vals.astype(np.int64),
                    np.full(len(samples), nbits, dtype=np.int64))
    return t


def fixed_subframe(options, wasted_bps, bits_per_sample, samples):
    """encodes a FIXED subframe at the best difference order"""
    # successive differences; error sums skip the first (4 - order)
    # entries so every candidate sums over n - 4 values
    # (reference py_encoders/flac.py:449-469)
    residuals = [samples]
    total_error = [int(np.abs(residuals[-1][4:]).sum())]
    if len(samples) > 4:
        for order in range(1, 5):
            residuals.append(np.diff(residuals[-1]))
            total_error.append(
                int(np.abs(residuals[-1][4 - order:]).sum()))
        for order in range(4):
            if total_error[order] < min(total_error[order + 1:]):
                break
        else:
            order = 4
    else:
        order = 0

    t = TokenStream()
    t.write(1, 0)
    t.write(3, 1)
    t.write(3, order)
    write_wasted(t, wasted_bps)
    nbits = bits_per_sample - wasted_bps
    for sample in samples[:order]:
        t.write_signed(nbits, int(sample))
    encode_residuals(t, options, order, len(samples), residuals[order])
    return t


def encode_residuals(t, options, order, block_size, residuals):
    """performs the Rice partition search and writes the residual block

    exact reference semantics (py_encoders/flac.py:489-535):
    partition sizes are block_size/2^porder (first partition minus
    order), parameter from the abs-sum threshold loop, total size
    counted as sum(4 + partition_bits), best strictly smaller
    """
    abs_res = np.abs(residuals)
    # zigzag: non-negative -> 2r, negative -> 2|r|-1
    unsigned = np.where(residuals >= 0,
                        residuals << 1,
                        ((-residuals - 1) << 1) | 1).astype(np.int64)

    best_porder = None
    best_size = 2 ** 63
    best_params = None

    # stop at the first partition order which doesn't evenly divide
    # block_size (reference src/encoders/flac.c:1389-1393); the
    # partition count must also leave the first partition non-negative
    for porder in range(0, options.max_residual_partition_order + 1):
        if block_size % (1 << porder):
            break
        psize = block_size >> porder
        if psize <= order and porder > 0:
            break
        boundaries = [0] + [psize * (p + 1) - order
                            for p in range(1 << porder)]
        params = []
        total = 0
        for p in range(1 << porder):
            n = boundaries[p + 1] - boundaries[p]
            psum = int(abs_res[boundaries[p]:boundaries[p + 1]].sum()) \
                if n else 0
            r = 0
            while (n << r) < psum:
                if r < options.max_rice_parameter:
                    r += 1
                else:
                    break
            params.append(r)
            seg = unsigned[boundaries[p]:boundaries[p + 1]]
            total += 4 + int((seg >> r).sum()) + n * (1 + r)
        if total < best_size:
            best_porder = porder
            best_size = total
            best_params = params

    coding_method = 1 if max(best_params) > 14 else 0
    t.write(2, coding_method)
    t.write(4, best_porder)

    psize = block_size >> best_porder
    boundaries = [0] + [psize * (p + 1) - order
                        for p in range(1 << best_porder)]
    for p in range(1 << best_porder):
        r = best_params[p]
        t.write(5 if coding_method else 4, r)
        seg = unsigned[boundaries[p]:boundaries[p + 1]]
        # each rice code: (u >> r) zeros, a 1 bit, then r LSBs
        msb = seg >> r
        payload = (1 << r) | (seg & ((1 << r) - 1))
        t.extend_arrays(payload, msb + (1 + r))
    return t


def tukey_window(n, alpha=0.5):
    """the tukey window (shared spec: ops/lpc.py)"""
    from ..ops import lpc as lpc_ops
    return lpc_ops.tukey_window(n, alpha)


def cached_tukey_window(n):
    return tukey_window(n, 0.5)


def compute_lpc_coefficients(options, wasted_bps, bits_per_sample,
                             samples):
    """returns an (order, qlp_coeffs, qlp_shift) triple

    analysis numerics are delegated to the shared deterministic
    primitives in ops/lpc.py so the batched device path produces
    byte-identical output"""
    from ..ops import lpc as lpc_ops

    K = options.max_lpc_order
    if len(samples) <= K + 1:
        return (1, [0], 0)

    windowed = samples.astype(np.float64) * tukey_window(len(samples))
    autocorrelation = lpc_ops.autocorrelation(np, windowed[None], K)[0]

    if (len(autocorrelation) <= 1) or np.all(autocorrelation == 0.0):
        return (1, [0], 0)

    (coeffs, errors) = lpc_ops.levinson(np, autocorrelation[None], K)
    (qlp_all, shifts_all) = lpc_ops.quantize_all_orders(
        np, coeffs, options.qlp_precision)

    def order_candidate(order):
        return ([int(v) for v in qlp_all[0, order - 1, :order]],
                int(shifts_all[0, order - 1]))

    if not options.exhaustive_model_search:
        order = int(lpc_ops.estimate_best_lpc_order(
            np, errors, len(samples), bits_per_sample,
            options.qlp_precision, K)[0])
        order = max(order, 1)
        (qlp_coeffs, qlp_shift) = order_candidate(order)
        return (order, qlp_coeffs, qlp_shift)
    else:
        best_subframe_size = 2 ** 32
        best = None
        for order in range(1, K + 1):
            (qlp_coeffs, qlp_shift) = order_candidate(order)
            size = lpc_subframe(options, wasted_bps, bits_per_sample,
                                order, options.qlp_precision,
                                qlp_shift, qlp_coeffs, samples).bits()
            if size < best_subframe_size:
                best_subframe_size = size
                best = (order, qlp_coeffs, qlp_shift)
        return best


def lpc_residuals(samples, qlp_coeffs, qlp_shift):
    """exact integer LPC residuals, vectorized

    r[i] = s[order+i] - (sum_j qlp[j] * s[order+i-1-j] >> shift)"""
    order = len(qlp_coeffs)
    n = len(samples)
    # prediction via sliding dot product (float64 is exact here:
    # |sum| < 2^(bps+1 + precision + log2(order)) << 2^53)
    coeffs = np.array(qlp_coeffs, dtype=np.float64)
    s = samples.astype(np.float64)
    pred = np.zeros(n - order, dtype=np.float64)
    for (j, c) in enumerate(coeffs):
        # prediction for sample i uses samples[i-1-j]
        pred += c * s[order - 1 - j:n - 1 - j]
    # arithmetic right shift on the exact integer value
    shifted = pred.astype(np.int64) >> qlp_shift
    return samples[order:] - shifted


def lpc_subframe(options, wasted_bps, bits_per_sample,
                 order, qlp_precision, qlp_shift, qlp_coeffs, samples):
    """encodes an LPC subframe, returning a TokenStream"""
    t = TokenStream()
    t.write(1, 0)
    t.write(1, 1)
    t.write(5, order - 1)
    write_wasted(t, wasted_bps)
    nbits = bits_per_sample - wasted_bps
    for sample in samples[:order]:
        t.write_signed(nbits, int(sample))
    t.write(4, qlp_precision - 1)
    t.write_signed(5, qlp_shift)
    for c in qlp_coeffs:
        t.write_signed(qlp_precision, c)
    residuals = lpc_residuals(samples, qlp_coeffs, qlp_shift)
    encode_residuals(t, options, order, len(samples), residuals)
    return t
