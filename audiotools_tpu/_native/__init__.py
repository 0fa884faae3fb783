"""Native host kernels: build-on-first-import C++ library via ctypes.

Compiles hostkernels.cpp with g++ -O3 into a cached shared object and
exposes the entry points (atpu_pack_frames, atpu_flac_decode, CRCs).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "hostkernels.cpp")

_lib = None
_build_error = None


class EmitOverflow(ValueError):
    """the decision array implied more output bytes than the emitter's
    worst-case buffer — analysis produced unsafe (undersized) Rice
    parameters, e.g. when quantized-analysis uploads flattened a
    partition whose exact residuals are large.  Callers retry the
    batch with exact (non-quantized) analysis."""


def _build_and_load():
    global _lib, _build_error
    if _lib is not None:
        return _lib
    if _build_error is not None:
        raise ImportError(_build_error)

    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    cache_dir = os.environ.get(
        "ATPU_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "atpu"))
    os.makedirs(cache_dir, exist_ok=True)
    so_path = os.path.join(cache_dir, "hostkernels-%s.so" % (digest,))

    if not os.path.exists(so_path):
        tmp_path = so_path + ".%d.tmp" % (os.getpid(),)
        cmd = ["g++", "-O3", "-march=native", "-funroll-loops", "-g",
               "-shared", "-fPIC", "-std=c++17",
               "-fno-exceptions", "-o", tmp_path, _SRC]
        try:
            try:
                subprocess.run(cmd, check=True, capture_output=True)
            except subprocess.CalledProcessError:
                # retry without -march=native (unsupported targets)
                cmd = [c for c in cmd if c != "-march=native"]
                subprocess.run(cmd, check=True, capture_output=True)
            os.replace(tmp_path, so_path)
        except (subprocess.CalledProcessError, OSError) as err:
            stderr = getattr(err, "stderr", b"")
            _build_error = "failed to build hostkernels: %s %s" % (
                err, stderr.decode("utf-8", "replace")
                if isinstance(stderr, bytes) else stderr)
            print(_build_error, file=sys.stderr)
            raise ImportError(_build_error)

    lib = ctypes.CDLL(so_path)

    lib.atpu_pack_frames.restype = ctypes.c_int64
    lib.atpu_pack_frames.argtypes = [
        ctypes.POINTER(ctypes.c_int64),   # vals
        ctypes.POINTER(ctypes.c_int32),   # nbits
        ctypes.POINTER(ctypes.c_int64),   # token_counts
        ctypes.POINTER(ctypes.c_int64),   # header_token_counts
        ctypes.c_int64,                   # n_frames
        ctypes.POINTER(ctypes.c_uint8),   # out
        ctypes.POINTER(ctypes.c_int64),   # out_lens
    ]

    lib.atpu_flac_decode.restype = ctypes.c_int64
    lib.atpu_flac_decode.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),   # data
        ctypes.c_int64,                   # data_len
        ctypes.c_int32,                   # stream_bps
        ctypes.c_int32,                   # stream_channels
        ctypes.c_int64,                   # max_samples
        ctypes.POINTER(ctypes.c_int32),   # out_samples
        ctypes.POINTER(ctypes.c_int64),   # consumed_bytes
        ctypes.c_int32,                   # verify_crc
        ctypes.POINTER(ctypes.c_uint8),   # md5_state (nullable)
    ]

    lib.atpu_flac_scan.restype = ctypes.c_int64
    lib.atpu_flac_scan.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),   # data
        ctypes.c_int64,                   # data_len
        ctypes.c_int32,                   # stream_bps
        ctypes.c_int32,                   # stream_channels
        ctypes.c_int64,                   # max_samples
        ctypes.c_int32,                   # max_frames
        ctypes.c_int32,                   # max_parts
        ctypes.c_int32,                   # verify_crc
        ctypes.c_int32,                   # chunk_codes
        ctypes.POINTER(ctypes.c_int32),   # frame_meta [max_frames, 4]
        ctypes.POINTER(ctypes.c_int32),   # sub_meta [max_frames*8, 8]
        ctypes.POINTER(ctypes.c_int32),   # warmup [max_frames*8, 32]
        ctypes.POINTER(ctypes.c_int32),   # qlp [max_frames*8, 32]
        ctypes.POINTER(ctypes.c_int32),   # part_meta [max_parts, 8]
        ctypes.POINTER(ctypes.c_int64),   # counts [6]
    ]

    lib.atpu_flac_emit_frames.restype = ctypes.c_int64
    lib.atpu_flac_emit_frames.argtypes = [
        ctypes.POINTER(ctypes.c_int64),   # frame_numbers
        ctypes.POINTER(ctypes.c_int32),   # block_sizes
        ctypes.POINTER(ctypes.c_int32),   # assignments
        ctypes.POINTER(ctypes.c_int32),   # choices
        ctypes.POINTER(ctypes.c_int32),   # orders
        ctypes.POINTER(ctypes.c_int32),   # wasteds
        ctypes.POINTER(ctypes.c_int32),   # porders
        ctypes.POINTER(ctypes.c_int32),   # shifts
        ctypes.POINTER(ctypes.c_int32),   # precisions
        ctypes.POINTER(ctypes.c_int32),   # qlp_coeffs
        ctypes.POINTER(ctypes.c_int32),   # rice_params
        ctypes.POINTER(ctypes.c_int32),   # samples
        ctypes.POINTER(ctypes.c_int32),   # residuals
        ctypes.c_int64,                   # n_frames
        ctypes.c_int32,                   # max_subframes
        ctypes.c_int32,                   # max_order
        ctypes.c_int32,                   # max_partitions
        ctypes.c_int32,                   # max_block
        ctypes.c_int32,                   # sample_rate
        ctypes.c_int32,                   # stream_bps
        ctypes.c_int32,                   # stream_channels
        ctypes.POINTER(ctypes.c_uint8),   # out
        ctypes.POINTER(ctypes.c_int64),   # out_lens (cumulative ends)
    ]

    lib.atpu_flac_emit_frames2.restype = ctypes.c_int64
    lib.atpu_flac_emit_frames2.argtypes = [
        ctypes.POINTER(ctypes.c_int32),   # blocks [F, max_block, ch]
        ctypes.POINTER(ctypes.c_int64),   # frame_numbers
        ctypes.POINTER(ctypes.c_int32),   # block_sizes
        ctypes.POINTER(ctypes.c_int32),   # packed decisions
        ctypes.c_int64,                   # n_frames
        ctypes.c_int32,                   # max_subframes
        ctypes.c_int32,                   # max_order
        ctypes.c_int32,                   # max_partitions
        ctypes.c_int32,                   # max_block
        ctypes.c_int32,                   # sample_rate
        ctypes.c_int32,                   # stream_bps
        ctypes.c_int32,                   # stream_channels
        ctypes.c_int32,                   # qlp_precision
        ctypes.c_int32,                   # compact row layout flag
        ctypes.c_int32,                   # emit_max_rice (-1 = off)
        ctypes.POINTER(ctypes.c_int32),   # probe_thr [F] (nullable)
        ctypes.POINTER(ctypes.c_uint8),   # probe_out [F] (nullable)
        ctypes.POINTER(ctypes.c_uint8),   # out
        ctypes.POINTER(ctypes.c_int64),   # out_lens (cumulative ends)
        ctypes.c_int64,                   # out_capacity
    ]

    lib.atpu_flac_emit_frames2rb.restype = ctypes.c_int64
    # the rb (splice) entry has no emit_max_rice / floor probe —
    # device-packed residual bits serialize verbatim
    lib.atpu_flac_emit_frames2rb.argtypes = (
        [a for (i, a) in
         enumerate(lib.atpu_flac_emit_frames2.argtypes)
         if i not in (14, 15, 16)] + [
            ctypes.POINTER(ctypes.c_uint32),  # rb_words
            ctypes.POINTER(ctypes.c_int64),   # rb_bits
            ctypes.c_int64,                   # rb_stride
        ])

    lib.atpu_flac_qplan.restype = ctypes.c_int32
    lib.atpu_flac_qplan.argtypes = [
        ctypes.POINTER(ctypes.c_int32),   # blocks [B, n, ch]
        ctypes.c_int64,                   # B
        ctypes.c_int64,                   # n
        ctypes.c_int64,                   # ch
        ctypes.c_int32,                   # bps
        ctypes.c_int32,                   # guard
        ctypes.c_int32,                   # cap_margin
        ctypes.c_int32,                   # noise_extra
        ctypes.c_int32,                   # stereo_trial
        ctypes.POINTER(ctypes.c_int32),   # t_out [B, ch]
        ctypes.POINTER(ctypes.c_int32),   # x0_out [B, ch]
        ctypes.POINTER(ctypes.c_int32),   # or_out [B, V]
        ctypes.POINTER(ctypes.c_uint8),   # const_out [B, V]
        ctypes.POINTER(ctypes.c_uint8),   # md5_state (nullable)
    ]

    lib.atpu_flac_qpack_bits.restype = None
    lib.atpu_flac_qpack_bits.argtypes = [
        ctypes.POINTER(ctypes.c_int32),   # blocks [B, n, ch]
        ctypes.c_int64,                   # B
        ctypes.c_int64,                   # n
        ctypes.c_int64,                   # ch
        ctypes.POINTER(ctypes.c_int32),   # t [B, ch]
        ctypes.c_int32,                   # k
        ctypes.POINTER(ctypes.c_uint32),  # packed [B, ch, W]
        ctypes.c_int64,                   # W
    ]

    lib.atpu_flac_qpack_bits2.restype = ctypes.c_int32
    lib.atpu_flac_qpack_bits2.argtypes = [
        ctypes.POINTER(ctypes.c_int32),   # blocks [B, n, ch]
        ctypes.c_int64,                   # B
        ctypes.c_int64,                   # n
        ctypes.c_int64,                   # ch
        ctypes.POINTER(ctypes.c_int32),   # t [B, ch]
        ctypes.c_int32,                   # k_base
        ctypes.POINTER(ctypes.c_uint32),  # packed [B, ch, W]
        ctypes.c_int64,                   # W
        ctypes.c_int32,                   # E
        ctypes.POINTER(ctypes.c_int32),   # exc_pos [B, ch, E]
        ctypes.POINTER(ctypes.c_uint32),  # exc_val [B, ch, E]
    ]

    lib.atpu_alac_emit_framesets.restype = ctypes.c_int64
    lib.atpu_alac_emit_framesets.argtypes = [
        ctypes.POINTER(ctypes.c_int32),   # blocks [B, max_n, ch]
        ctypes.POINTER(ctypes.c_int32),   # ns [B]
        ctypes.c_int64,                   # n_blocks
        ctypes.POINTER(ctypes.c_int32),   # layout_off [G]
        ctypes.POINTER(ctypes.c_int32),   # layout_w [G]
        ctypes.c_int32,                   # n_groups
        ctypes.POINTER(ctypes.c_int32),   # packed [B,G,5,2,15]
        ctypes.c_int32,                   # ch_total
        ctypes.c_int32,                   # max_n
        ctypes.c_int32,                   # block_size
        ctypes.c_int32,                   # initial_history
        ctypes.c_int32,                   # history_multiplier
        ctypes.c_int32,                   # maximum_k
        ctypes.c_int32,                   # interlacing_shift
        ctypes.c_int32,                   # min_lw
        ctypes.c_int32,                   # max_lw
        ctypes.c_int32,                   # bps
        ctypes.POINTER(ctypes.c_uint8),   # out
        ctypes.POINTER(ctypes.c_int64),   # out_ends
    ]

    lib.atpu_alac_decode.restype = ctypes.c_int64
    lib.atpu_alac_decode.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),   # data
        ctypes.c_int64,                   # len
        ctypes.c_int32,                   # bps
        ctypes.c_int32,                   # channels
        ctypes.c_int32,                   # samples_per_frame
        ctypes.c_int32,                   # initial_history
        ctypes.c_int32,                   # history_multiplier
        ctypes.c_int32,                   # maximum_k
        ctypes.c_int64,                   # max_frames
        ctypes.POINTER(ctypes.c_int32),   # out
        ctypes.POINTER(ctypes.c_int64),   # consumed
    ]

    lib.atpu_alac_scan.restype = ctypes.c_int64
    lib.atpu_alac_scan.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),   # data
        ctypes.c_int64,                   # len
        ctypes.c_int32,                   # bps
        ctypes.c_int32,                   # channels
        ctypes.c_int32,                   # samples_per_frame
        ctypes.c_int32,                   # initial_history
        ctypes.c_int32,                   # history_multiplier
        ctypes.c_int32,                   # maximum_k
        ctypes.c_int64,                   # max_frames
        ctypes.c_int64,                   # max_subs
        ctypes.POINTER(ctypes.c_int32),   # res_out
        ctypes.POINTER(ctypes.c_int32),   # sub_meta
        ctypes.POINTER(ctypes.c_int32),   # qlp_out
        ctypes.POINTER(ctypes.c_int32),   # pair_meta
        ctypes.POINTER(ctypes.c_int32),   # lsb_out
        ctypes.POINTER(ctypes.c_int32),   # fs_count
        ctypes.POINTER(ctypes.c_int64),   # info
    ]

    lib.atpu_pack_pcm.restype = None
    lib.atpu_pack_pcm.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_uint8)]
    lib.atpu_unpack_pcm.restype = None
    lib.atpu_unpack_pcm.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32)]

    lib.atpu_md5_init.restype = None
    lib.atpu_md5_init.argtypes = [ctypes.POINTER(ctypes.c_uint8)]
    lib.atpu_md5_update.restype = None
    lib.atpu_md5_update.argtypes = [ctypes.POINTER(ctypes.c_uint8),
                                    ctypes.POINTER(ctypes.c_uint8),
                                    ctypes.c_int64]
    lib.atpu_md5_update_pcm.restype = None
    lib.atpu_md5_update_pcm.argtypes = [ctypes.POINTER(ctypes.c_uint8),
                                        ctypes.POINTER(ctypes.c_int32),
                                        ctypes.c_int64,
                                        ctypes.c_int32,
                                        ctypes.c_int32]
    lib.atpu_md5_final.restype = None
    lib.atpu_md5_final.argtypes = [ctypes.POINTER(ctypes.c_uint8),
                                   ctypes.POINTER(ctypes.c_uint8)]

    lib.atpu_crc16.restype = ctypes.c_uint16
    lib.atpu_crc16.argtypes = [ctypes.POINTER(ctypes.c_uint8),
                               ctypes.c_int64, ctypes.c_uint16]
    lib.atpu_resample_fir.restype = None
    lib.atpu_resample_fir.argtypes = [
        ctypes.POINTER(ctypes.c_double),  # hist [n, ch]
        ctypes.c_int64,                   # hist_len
        ctypes.c_int32,                   # channels
        ctypes.POINTER(ctypes.c_int64),   # starts [M]
        ctypes.POINTER(ctypes.c_int32),   # q [M]
        ctypes.POINTER(ctypes.c_double),  # bank [n_phases, taps]
        ctypes.c_int32,                   # taps
        ctypes.c_int64,                   # m_count
        ctypes.POINTER(ctypes.c_double)]  # out [M, ch]
    lib.atpu_accuraterip_update.restype = None
    lib.atpu_accuraterip_update.argtypes = [
        ctypes.POINTER(ctypes.c_int32),   # samples [n, 2]
        ctypes.c_int64,                   # n
        ctypes.c_int64,                   # first_index (1-based)
        ctypes.c_int64,                   # start_offset
        ctypes.c_int64,                   # end_offset
        ctypes.POINTER(ctypes.c_uint32),  # v1 accumulator
        ctypes.POINTER(ctypes.c_uint32)]  # v2 accumulator
    lib.atpu_shn_encode.restype = ctypes.c_int64
    lib.atpu_shn_encode.argtypes = [
        ctypes.POINTER(ctypes.c_int32),   # samples [n, ch]
        ctypes.c_int64,                   # n
        ctypes.c_int32,                   # channels
        ctypes.c_int32,                   # bps
        ctypes.c_int32,                   # signed
        ctypes.c_int32,                   # big endian
        ctypes.POINTER(ctypes.c_uint8),   # header
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8),   # footer
        ctypes.c_int64,
        ctypes.c_int32,                   # block size
        ctypes.POINTER(ctypes.c_uint8),   # out
    ]

    lib.atpu_shn_encode2.restype = ctypes.c_int64
    lib.atpu_shn_encode2.argtypes = \
        lib.atpu_shn_encode.argtypes[:-1] + [
            ctypes.POINTER(ctypes.c_int32),  # decisions (nullable)
            ctypes.POINTER(ctypes.c_uint8),  # out
        ]

    lib.atpu_shn_decode.restype = ctypes.c_int64
    lib.atpu_shn_decode.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),   # data
        ctypes.c_int64,                   # len
        ctypes.c_int64,                   # max_frames
        ctypes.POINTER(ctypes.c_int32),   # out
        ctypes.POINTER(ctypes.c_int64),   # info
    ]

    lib.atpu_shn_scan.restype = ctypes.c_int64
    lib.atpu_shn_scan.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),   # data
        ctypes.c_int64,                   # len
        ctypes.c_int64,                   # max_rows
        ctypes.c_int64,                   # max_block
        ctypes.POINTER(ctypes.c_int32),   # residuals [rows, max_block]
        ctypes.POINTER(ctypes.c_int32),   # row_meta [rows, 4]
        ctypes.POINTER(ctypes.c_int64),   # info
    ]

    lib.atpu_tta_encode_frames.restype = ctypes.c_int64
    lib.atpu_tta_encode_frames.argtypes = [
        ctypes.POINTER(ctypes.c_int32),   # samples [total, ch]
        ctypes.POINTER(ctypes.c_int32),   # frame_sizes
        ctypes.c_int64,                   # n_tta_frames
        ctypes.c_int32,                   # channels
        ctypes.c_int32,                   # bps
        ctypes.POINTER(ctypes.c_uint8),   # out
        ctypes.POINTER(ctypes.c_int64),   # out_ends
    ]

    lib.atpu_tta_pack_frames.restype = ctypes.c_int64
    lib.atpu_tta_pack_frames.argtypes = [
        ctypes.POINTER(ctypes.c_int32),   # residuals [total, ch]
        ctypes.POINTER(ctypes.c_int32),   # frame_sizes
        ctypes.c_int64,                   # n_tta_frames
        ctypes.c_int32,                   # channels
        ctypes.POINTER(ctypes.c_uint8),   # out
        ctypes.POINTER(ctypes.c_int64),   # out_ends
    ]

    lib.atpu_tta_decode_frame.restype = ctypes.c_int64
    lib.atpu_tta_decode_frame.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),   # data
        ctypes.c_int64,                   # len
        ctypes.c_int64,                   # n
        ctypes.c_int32,                   # channels
        ctypes.c_int32,                   # bps
        ctypes.POINTER(ctypes.c_int32),   # out
        ctypes.c_int32,                   # verify_crc
    ]

    lib.atpu_tta_scan_residuals.restype = ctypes.c_int64
    lib.atpu_tta_scan_residuals.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),   # data (concatenated frames)
        ctypes.c_int64,                   # len
        ctypes.POINTER(ctypes.c_int64),   # frame_lens
        ctypes.POINTER(ctypes.c_int32),   # frame_sizes
        ctypes.c_int64,                   # n_tta_frames
        ctypes.c_int32,                   # channels
        ctypes.POINTER(ctypes.c_int32),   # out [total, ch]
        ctypes.c_int32,                   # verify_crc
    ]

    lib.atpu_verify_mpeg.restype = ctypes.c_int64
    lib.atpu_verify_mpeg.argtypes = [ctypes.POINTER(ctypes.c_uint8),
                                     ctypes.c_int64,
                                     ctypes.POINTER(ctypes.c_int64)]

    lib.atpu_ogg_crc.restype = ctypes.c_uint32
    lib.atpu_ogg_crc.argtypes = [ctypes.POINTER(ctypes.c_uint8),
                                 ctypes.c_int64, ctypes.c_uint32]

    lib.atpu_crc8.restype = ctypes.c_uint8
    lib.atpu_crc8.argtypes = [ctypes.POINTER(ctypes.c_uint8),
                              ctypes.c_int64, ctypes.c_uint8]

    lib.atpu_shn_split.restype = ctypes.c_int64
    lib.atpu_shn_split.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64)]

    lib.atpu_iir.restype = None
    lib.atpu_iir.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.c_int64, ctypes.POINTER(ctypes.c_double)]

    lib.atpu_mlp_new.restype = ctypes.c_void_p
    lib.atpu_mlp_new.argtypes = []
    lib.atpu_mlp_free.restype = None
    lib.atpu_mlp_free.argtypes = [ctypes.c_void_p]
    lib.atpu_mlp_decode.restype = ctypes.c_int64
    lib.atpu_mlp_decode.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64)]

    _lib = lib
    return lib


def get_lib():
    """returns the loaded native library, building it if necessary"""
    return _build_and_load()


def _as_ptr(array, ctype):
    return array.ctypes.data_as(ctypes.POINTER(ctype))


def resample_fir(hist, starts, q, bank):
    """polyphase FIR: out[m] = bank[q[m]] . hist[starts[m]:+taps]

    hist: float64 [n, ch]; starts: int64 [M]; q: int32 [M];
    bank: float64 [n_phases, taps].  Returns float64 [M, ch]."""
    import numpy as np

    lib = get_lib()
    hist = np.ascontiguousarray(hist, dtype=np.float64)
    starts = np.ascontiguousarray(starts, dtype=np.int64)
    q = np.ascontiguousarray(q, dtype=np.int32)
    bank = np.ascontiguousarray(bank, dtype=np.float64)
    (n, ch) = hist.shape
    (n_phases, taps) = bank.shape
    m_count = starts.shape[0]
    out = np.empty((m_count, ch), dtype=np.float64)
    lib.atpu_resample_fir(
        _as_ptr(hist, ctypes.c_double), n, ch,
        _as_ptr(starts, ctypes.c_int64),
        _as_ptr(q, ctypes.c_int32),
        _as_ptr(bank, ctypes.c_double), taps, m_count,
        _as_ptr(out, ctypes.c_double))
    return out


def accuraterip_update(samples, first_index, start_offset, end_offset,
                       v1, v2):
    """folds int32 [n, 2] samples into AccurateRip V1/V2 accumulators

    returns the updated (v1, v2) 32-bit values"""
    import numpy as np

    lib = get_lib()
    samples = np.ascontiguousarray(samples, dtype=np.int32)
    c1 = ctypes.c_uint32(v1)
    c2 = ctypes.c_uint32(v2)
    lib.atpu_accuraterip_update(
        _as_ptr(samples, ctypes.c_int32),
        samples.shape[0], first_index, start_offset, end_offset,
        ctypes.byref(c1), ctypes.byref(c2))
    return (c1.value, c2.value)


def pack_frames(vals, nbits, token_counts, header_token_counts):
    """packs token arrays into FLAC frame bytes with CRCs

    vals: int64 array of token payloads
    nbits: int32 array of token bit counts
    token_counts / header_token_counts: int64 arrays, one per frame
    returns (bytes, per-frame lengths int64 array)
    """
    import numpy as np

    lib = get_lib()
    vals = np.ascontiguousarray(vals, dtype=np.int64)
    nbits_arr = np.ascontiguousarray(nbits, dtype=np.int32)
    token_counts = np.ascontiguousarray(token_counts, dtype=np.int64)
    header_counts = np.ascontiguousarray(header_token_counts,
                                         dtype=np.int64)
    n_frames = len(token_counts)
    # worst case: all payload bits plus per-frame CRC/padding overhead
    worst = int(nbits_arr.astype(np.int64).sum() // 8) + 16 * n_frames + 64
    out = np.empty(worst, dtype=np.uint8)
    out_lens = np.empty(n_frames, dtype=np.int64)

    total = lib.atpu_pack_frames(
        _as_ptr(vals, ctypes.c_int64),
        _as_ptr(nbits_arr, ctypes.c_int32),
        _as_ptr(token_counts, ctypes.c_int64),
        _as_ptr(header_counts, ctypes.c_int64),
        n_frames,
        _as_ptr(out, ctypes.c_uint8),
        _as_ptr(out_lens, ctypes.c_int64))
    if total < 0:
        raise ValueError("malformed token stream (code %d)" % (total,))
    return (out[:total].tobytes(), out_lens)


def flac_emit_frames(frame_numbers, block_sizes, assignments,
                     choices, orders, wasteds, porders, shifts,
                     precisions, qlp_coeffs, rice_params,
                     samples, residuals,
                     max_subframes, max_order, max_partitions, max_block,
                     sample_rate, stream_bps, stream_channels):
    """emits complete FLAC frames from per-subframe decision arrays

    returns (frame bytes, per-frame byte lengths int64 array)"""
    import numpy as np

    lib = get_lib()

    def a(x, dt):
        return np.ascontiguousarray(x, dtype=dt)

    frame_numbers = a(frame_numbers, np.int64)
    n_frames = len(frame_numbers)
    block_sizes = a(block_sizes, np.int32)
    assignments = a(assignments, np.int32)
    choices = a(choices, np.int32)
    orders = a(orders, np.int32)
    wasteds = a(wasteds, np.int32)
    porders = a(porders, np.int32)
    shifts = a(shifts, np.int32)
    precisions = a(precisions, np.int32)
    qlp_coeffs = a(qlp_coeffs, np.int32)
    rice_params = a(rice_params, np.int32)
    samples = a(samples, np.int32)
    if residuals is not None:
        residuals = a(residuals, np.int32)

    worst = int(n_frames) * (max_block * max_subframes * 5 + 1024)
    out = np.empty(worst, dtype=np.uint8)
    out_ends = np.empty(n_frames, dtype=np.int64)

    total = lib.atpu_flac_emit_frames(
        _as_ptr(frame_numbers, ctypes.c_int64),
        _as_ptr(block_sizes, ctypes.c_int32),
        _as_ptr(assignments, ctypes.c_int32),
        _as_ptr(choices, ctypes.c_int32),
        _as_ptr(orders, ctypes.c_int32),
        _as_ptr(wasteds, ctypes.c_int32),
        _as_ptr(porders, ctypes.c_int32),
        _as_ptr(shifts, ctypes.c_int32),
        _as_ptr(precisions, ctypes.c_int32),
        _as_ptr(qlp_coeffs, ctypes.c_int32),
        _as_ptr(rice_params, ctypes.c_int32),
        _as_ptr(samples, ctypes.c_int32),
        (_as_ptr(residuals, ctypes.c_int32) if residuals is not None
         else ctypes.POINTER(ctypes.c_int32)()),
        n_frames, max_subframes, max_order, max_partitions, max_block,
        sample_rate, stream_bps, stream_channels,
        _as_ptr(out, ctypes.c_uint8),
        _as_ptr(out_ends, ctypes.c_int64))
    if total < 0:
        raise ValueError("frame emit error (code %d)" % (total,))
    lens = np.diff(np.concatenate([[0], out_ends]))
    return (out[:total].tobytes(), lens)


def flac_emit_frames2(blocks, frame_numbers, block_sizes, packed,
                      max_subframes, max_order, max_partitions,
                      sample_rate, stream_bps, stream_channels,
                      qlp_precision, compact=False,
                      rb_words=None, rb_bits=None,
                      emit_max_rice=None,
                      probe_thr=None, probe_out=None):
    """emits FLAC frames from raw PCM blocks + packed decision rows

    blocks: int32 [n_frames, max_block, channels] interleaved PCM
    packed: int32 [n_frames, 1 + max_subframes * (6 + max_order +
            max_partitions)] device decision output; with
            compact=True, the 3.5x-smaller wire layout from
            ops/flac_frames.compact_decisions instead
    rb_words/rb_bits: optional device-packed residual partition blocks
            (ops/pallas_bitpack.py): uint32
            [n_frames * max_subframes, rb_stride] big-endian word rows
            + exact bit lengths int64 — FIXED/LPC subframes splice
            these bits instead of re-deriving residuals on host
    emit_max_rice: emit-stage exact entropy re-search bound (see
            hostkernels emit_rice_research); None derives the
            standard 14/30 bound from stream_bps when
            ATPU_EMIT_EXACT_RICE is active (default), -1 disables.
            Ignored on the rb (splice) path.
    probe_thr/probe_out: optional int32 [n_frames] / uint8
            [n_frames] — the quantization-floor stage-2 probe,
            evaluated for free from the exact residuals the emitter
            derives: frames with probe_thr >= 0 and any coded
            subframe whose mean |residual| bit length <= probe_thr
            set probe_out to 1 (caller zeroes probe_out).  Ignored
            on the rb path.
    returns (frame bytes, per-frame byte lengths int64 array)"""
    import numpy as np

    lib = get_lib()

    if emit_max_rice is None:
        from ..ref.flac_enc import emit_exact_rice_enabled
        emit_max_rice = ((14 if stream_bps <= 16 else 30)
                         if emit_exact_rice_enabled() else -1)

    blocks = np.ascontiguousarray(blocks, dtype=np.int32)
    frame_numbers = np.ascontiguousarray(frame_numbers, dtype=np.int64)
    block_sizes = np.ascontiguousarray(block_sizes, dtype=np.int32)
    packed = np.ascontiguousarray(packed, dtype=np.int32)
    n_frames = len(frame_numbers)
    max_block = blocks.shape[1]

    worst = int(n_frames) * (max_block * max_subframes * 5 + 1024)
    out = np.empty(worst, dtype=np.uint8)
    out_ends = np.empty(n_frames, dtype=np.int64)

    if rb_words is not None:
        rb_words = np.ascontiguousarray(rb_words, dtype=np.uint32)
        rb_bits = np.ascontiguousarray(rb_bits, dtype=np.int64)
        if rb_words.shape[0] != n_frames * max_subframes:
            raise ValueError("rb_words row count mismatch")
        total = lib.atpu_flac_emit_frames2rb(
            _as_ptr(blocks, ctypes.c_int32),
            _as_ptr(frame_numbers, ctypes.c_int64),
            _as_ptr(block_sizes, ctypes.c_int32),
            _as_ptr(packed, ctypes.c_int32),
            n_frames, max_subframes, max_order, max_partitions,
            max_block, sample_rate, stream_bps, stream_channels,
            qlp_precision, 1 if compact else 0,
            _as_ptr(out, ctypes.c_uint8),
            _as_ptr(out_ends, ctypes.c_int64),
            worst,
            _as_ptr(rb_words, ctypes.c_uint32),
            _as_ptr(rb_bits, ctypes.c_int64),
            rb_words.shape[1])
    else:
        if probe_thr is not None:
            probe_thr = np.ascontiguousarray(probe_thr,
                                             dtype=np.int32)
        total = lib.atpu_flac_emit_frames2(
            _as_ptr(blocks, ctypes.c_int32),
            _as_ptr(frame_numbers, ctypes.c_int64),
            _as_ptr(block_sizes, ctypes.c_int32),
            _as_ptr(packed, ctypes.c_int32),
            n_frames, max_subframes, max_order, max_partitions,
            max_block, sample_rate, stream_bps, stream_channels,
            qlp_precision, 1 if compact else 0, int(emit_max_rice),
            (_as_ptr(probe_thr, ctypes.c_int32)
             if probe_thr is not None else None),
            (_as_ptr(probe_out, ctypes.c_uint8)
             if probe_out is not None else None),
            _as_ptr(out, ctypes.c_uint8),
            _as_ptr(out_ends, ctypes.c_int64),
            worst)
    if total == -31:
        raise EmitOverflow(
            "frame emit overflow: decision array implies more than "
            "%d bytes (analysis produced unsafe Rice parameters)"
            % (worst,))
    if total < 0:
        raise ValueError("frame emit error (code %d)" % (total,))
    lens = np.diff(np.concatenate([[0], out_ends]))
    return (out[:total].tobytes(), lens)


def flac_qpack(blocks, bps, guard, stereo_trial, cap_margin=None,
               md5=None, noise_extra=None):
    """plans + bit-packs the quantized-analysis upload (ops/qpack.py
    wire format) in one native pass

    blocks: int32 [B, n, ch] exact samples
    cap_margin: minimum significant bits analysis keeps (t <= bps -
    cap_margin); defaults to ops/qpack.py cap_margin()
    md5: optional MD5 instance — the stream hash of these samples is
    folded into the plan scan while each block is cache-hot
    noise_extra: noise-adaptive coarsening bits (ops/qpack.py
    noise_extra(); 0 disables)
    returns (packed uint32 [B, ch, W], k, t int32 [B, ch],
    x0 int32 [B, ch], or_vals int32 [B, V], const_flags bool [B, V])"""
    import numpy as np

    if cap_margin is None:
        from ..ops import qpack as _qpack
        cap_margin = _qpack.cap_margin()
    if noise_extra is None:
        from ..ops import qpack as _qpack
        noise_extra = _qpack.noise_extra()

    lib = get_lib()
    blocks = np.ascontiguousarray(blocks, dtype=np.int32)
    (B, n, ch) = blocks.shape
    V = 4 if (stereo_trial and ch == 2) else ch
    t = np.empty((B, ch), dtype=np.int32)
    x0 = np.empty((B, ch), dtype=np.int32)
    or_vals = np.empty((B, V), dtype=np.int32)
    const_flags = np.empty((B, V), dtype=np.uint8)
    k = lib.atpu_flac_qplan(
        _as_ptr(blocks, ctypes.c_int32), B, n, ch,
        int(bps), int(guard), int(cap_margin), int(noise_extra),
        1 if (stereo_trial and ch == 2) else 0,
        _as_ptr(t, ctypes.c_int32), _as_ptr(x0, ctypes.c_int32),
        _as_ptr(or_vals, ctypes.c_int32),
        _as_ptr(const_flags, ctypes.c_uint8),
        (_as_ptr(md5._state, ctypes.c_uint8)
         if md5 is not None else None))
    if n > 1:
        # same grid as the numpy spec (ops/qpack.round_k): bounds the
        # jit-compile count and rejects k > 31 (wire format limit)
        from ..ops import qpack as _qpack2
        k = _qpack2.round_k(int(k))
    W = ((n - 1) * k + 31) // 32 + 1 if n > 1 else 1
    packed = np.zeros((B, ch, W), dtype=np.uint32)
    if n > 1:
        lib.atpu_flac_qpack_bits(
            _as_ptr(blocks, ctypes.c_int32), B, n, ch,
            _as_ptr(t, ctypes.c_int32), int(k),
            _as_ptr(packed, ctypes.c_uint32), W)
    return (packed, int(k), t, x0, or_vals, const_flags.astype(bool))


def flac_qpack_patched(blocks, bps, guard, stereo_trial, k_base, E,
                       cap_margin=None, md5=None, noise_extra=None):
    """flac_qpack with the patched-base wire: diffs pack at the
    narrow ``k_base`` and the rare wider values ride as (position,
    full value) exceptions, at most ``E`` per (block, channel)

    returns (packed uint32 [B, ch, W], k_full, t, x0, or_vals,
    const_flags, exc_pos int32 [B, ch, E], exc_val uint32 [B, ch, E],
    max_exc) where k_full is the plain-format width the batch would
    need (grid-rounded) and max_exc is the largest per-row exception
    count encountered.  When max_exc > E the packed words/exceptions
    are INVALID (truncated) — the caller retries with a larger E or
    falls back to the plain format.  n must exceed 1."""
    import numpy as np

    if cap_margin is None:
        from ..ops import qpack as _qpack
        cap_margin = _qpack.cap_margin()

    lib = get_lib()
    blocks = np.ascontiguousarray(blocks, dtype=np.int32)
    (B, n, ch) = blocks.shape
    if n <= 1:
        raise ValueError("patched qpack wire requires n > 1")
    V = 4 if (stereo_trial and ch == 2) else ch
    t = np.empty((B, ch), dtype=np.int32)
    x0 = np.empty((B, ch), dtype=np.int32)
    or_vals = np.empty((B, V), dtype=np.int32)
    const_flags = np.empty((B, V), dtype=np.uint8)
    if noise_extra is None:
        from ..ops import qpack as _qpack0
        noise_extra = _qpack0.noise_extra()
    k_raw = lib.atpu_flac_qplan(
        _as_ptr(blocks, ctypes.c_int32), B, n, ch,
        int(bps), int(guard), int(cap_margin), int(noise_extra),
        1 if (stereo_trial and ch == 2) else 0,
        _as_ptr(t, ctypes.c_int32), _as_ptr(x0, ctypes.c_int32),
        _as_ptr(or_vals, ctypes.c_int32),
        _as_ptr(const_flags, ctypes.c_uint8),
        (_as_ptr(md5._state, ctypes.c_uint8)
         if md5 is not None else None))
    from ..ops import qpack as _qpack2
    k_full = _qpack2.round_k(int(k_raw))
    if k_base is None:
        # default: one grid step below the plain width
        below = [g for g in _qpack2.K_GRID if g < k_full]
        k_base = below[-1] if below else k_full
    kb = min(int(k_base), k_full)
    W = ((n - 1) * kb + 31) // 32 + 1
    packed = np.zeros((B, ch, W), dtype=np.uint32)
    exc_pos = np.empty((B, ch, E), dtype=np.int32)
    exc_val = np.empty((B, ch, E), dtype=np.uint32)
    max_exc = lib.atpu_flac_qpack_bits2(
        _as_ptr(blocks, ctypes.c_int32), B, n, ch,
        _as_ptr(t, ctypes.c_int32), kb,
        _as_ptr(packed, ctypes.c_uint32), W, int(E),
        _as_ptr(exc_pos, ctypes.c_int32),
        _as_ptr(exc_val, ctypes.c_uint32))
    return (packed, k_full, t, x0, or_vals,
            const_flags.astype(bool), exc_pos, exc_val, int(max_exc),
            kb)


def alac_emit_framesets(blocks, ns, layout, packed,
                        block_size, initial_history,
                        history_multiplier, maximum_k,
                        interlacing_shift, min_lw, max_lw, bps):
    """emits ALAC framesets from raw PCM + packed LPC candidates

    blocks: int32 [B, max_n, ch] wave-order PCM
    packed: int32 [B, G, 5, 2, 15] LPC candidate rows (device output)
    returns (frameset bytes, per-frameset byte sizes int64 array)"""
    import numpy as np

    lib = get_lib()
    blocks = np.ascontiguousarray(blocks, dtype=np.int32)
    ns = np.ascontiguousarray(ns, dtype=np.int32)
    packed = np.ascontiguousarray(packed, dtype=np.int32)
    (B, max_n, ch) = blocks.shape
    layout_off = np.asarray([off for (off, _w) in layout],
                            dtype=np.int32)
    layout_w = np.asarray([w for (_off, w) in layout], dtype=np.int32)

    worst = int(B) * (max_n * ch * ((bps // 8) + 2) + 256)
    out = np.empty(worst, dtype=np.uint8)
    out_ends = np.empty(B, dtype=np.int64)

    total = lib.atpu_alac_emit_framesets(
        _as_ptr(blocks, ctypes.c_int32),
        _as_ptr(ns, ctypes.c_int32),
        B,
        _as_ptr(layout_off, ctypes.c_int32),
        _as_ptr(layout_w, ctypes.c_int32),
        len(layout),
        _as_ptr(packed, ctypes.c_int32),
        ch, max_n, block_size, initial_history, history_multiplier,
        maximum_k, interlacing_shift, min_lw, max_lw, bps,
        _as_ptr(out, ctypes.c_uint8),
        _as_ptr(out_ends, ctypes.c_int64))
    if total < 0:
        raise ValueError("ALAC emit error (code %d)" % (total,))
    lens = np.diff(np.concatenate([[0], out_ends]))
    return (out[:total].tobytes(), lens)


def alac_decode(data, bps, channels, samples_per_frame,
                initial_history, history_multiplier, maximum_k,
                max_frames):
    """decodes ALAC framesets into int32 [frames, channels] wave order

    returns (samples, consumed_bytes)"""
    import numpy as np

    lib = get_lib()
    buf = np.frombuffer(data, dtype=np.uint8)
    out = np.empty(max_frames * channels, dtype=np.int32)
    consumed = ctypes.c_int64(0)
    decoded = lib.atpu_alac_decode(
        _as_ptr(buf, ctypes.c_uint8), len(buf),
        bps, channels, samples_per_frame,
        initial_history, history_multiplier, maximum_k,
        max_frames,
        _as_ptr(out, ctypes.c_int32),
        ctypes.byref(consumed))
    if decoded < 0:
        raise ValueError("truncated or corrupt ALAC stream "
                         "(native code %d)" % (decoded,))
    return (out[:decoded * channels].reshape(-1, channels),
            consumed.value)


def alac_scan(data, bps, channels, samples_per_frame,
              initial_history, history_multiplier, maximum_k,
              max_frames, max_subs):
    """structural scan for the device ALAC decode path

    returns a dict of numpy arrays (see atpu_alac_scan's layout doc):
    residuals [n_subs, spf], sub_meta [n_subs, 8], qlp [n_subs, 32],
    pair_meta [n_pairs, 8], lsbs [n_pairs, spf, 2],
    fs_count [n_fs], total_frames, consumed_bytes"""
    import numpy as np

    lib = get_lib()
    buf = np.frombuffer(data, dtype=np.uint8)
    spf = samples_per_frame
    res = np.zeros((max_subs, spf), dtype=np.int32)
    sub_meta = np.zeros((max_subs, 8), dtype=np.int32)
    qlp = np.zeros((max_subs, 32), dtype=np.int32)
    max_pairs = max_subs
    pair_meta = np.zeros((max_pairs, 8), dtype=np.int32)
    lsbs = np.zeros((max_pairs, spf, 2), dtype=np.int32)
    fs_count = np.zeros(max_subs, dtype=np.int32)
    info = np.zeros(5, dtype=np.int64)
    rc = lib.atpu_alac_scan(
        _as_ptr(buf, ctypes.c_uint8), len(buf),
        bps, channels, samples_per_frame,
        initial_history, history_multiplier, maximum_k,
        max_frames, max_subs,
        _as_ptr(res, ctypes.c_int32),
        _as_ptr(sub_meta, ctypes.c_int32),
        _as_ptr(qlp, ctypes.c_int32),
        _as_ptr(pair_meta, ctypes.c_int32),
        _as_ptr(lsbs, ctypes.c_int32),
        _as_ptr(fs_count, ctypes.c_int32),
        _as_ptr(info, ctypes.c_int64))
    if rc < 0:
        raise ValueError("truncated or corrupt ALAC stream "
                         "(native scan code %d)" % (rc,))
    (n_subs, n_pairs, n_fs, total, consumed) = (
        int(info[0]), int(info[1]), int(info[2]), int(info[3]),
        int(info[4]))
    return {
        "residuals": res[:n_subs],
        "sub_meta": sub_meta[:n_subs],
        "qlp": qlp[:n_subs],
        "pair_meta": pair_meta[:n_pairs],
        "lsbs": lsbs[:n_pairs],
        "fs_count": fs_count[:n_fs],
        "total_frames": total,
        "consumed_bytes": consumed,
    }


def flac_decode(data, stream_bps, stream_channels, max_samples,
                verify_crc=True, md5=None):
    """decodes FLAC frame data

    md5: optional MD5 instance; when given, the decoded samples are
    folded into it inside the native loop (cache-hot per frame, no
    second pass over the output)

    returns (samples int32 [frames, channels], consumed_bytes)"""
    import numpy as np

    lib = get_lib()
    buf = np.frombuffer(data, dtype=np.uint8)
    out = np.empty(max_samples * stream_channels, dtype=np.int32)
    consumed = ctypes.c_int64(0)
    decoded = lib.atpu_flac_decode(
        _as_ptr(buf, ctypes.c_uint8),
        len(buf),
        stream_bps,
        stream_channels,
        max_samples,
        _as_ptr(out, ctypes.c_int32),
        ctypes.byref(consumed),
        1 if verify_crc else 0,
        (_as_ptr(md5._state, ctypes.c_uint8) if md5 is not None
         else None))
    if decoded < 0:
        raise ValueError("truncated or corrupt FLAC stream "
                         "(native code %d)" % (decoded,))
    return (out[:decoded * stream_channels].reshape(-1, stream_channels),
            consumed.value)


def flac_scan(data, stream_bps, stream_channels, max_samples,
              max_frames, max_parts, verify_crc=True, chunk_codes=0):
    """structural scan of FLAC frame data for the DEVICE decode path

    Parses frames (validating CRC-8/16) and records predictor metadata
    and residual-partition bit spans WITHOUT extracting residuals —
    the device Rice-decodes and synthesizes them in batch
    (ops/rice_decode.py + ops/flac_synth.py).

    chunk_codes > 0 splits every residual run into records of at most
    chunk_codes codes with exact bit offsets (free checkpoints: the
    scan walks each code anyway) — the device decoder's parallelism
    lever (many short independent lanes instead of long sequential
    partitions).

    returns a dict of numpy arrays:
      frame_meta [F, 4]  {block_size, assignment, bps, byte_len}
      sub_meta   [S, 8]  {frame_idx, type, order, wasted, shift, ebps,
                          const_val, porder}
      warmup     [S, 32], qlp [S, 32]
      part_meta  [P, 8]  {sub_idx, dest_off, count, rice_k, raw_bits,
                          bit_off, bit_len, 0}
      consumed_bytes, total_pcm_frames
    or raises ValueError on a corrupt stream; a -30 code means the
    first frame exceeded max_parts (caller falls back to host decode)."""
    import numpy as np

    lib = get_lib()
    buf = np.frombuffer(data, dtype=np.uint8)
    frame_meta = np.zeros((max_frames, 4), dtype=np.int32)
    sub_meta = np.zeros((max_frames * 8, 8), dtype=np.int32)
    warmup = np.zeros((max_frames * 8, 32), dtype=np.int32)
    qlp = np.zeros((max_frames * 8, 32), dtype=np.int32)
    part_meta = np.zeros((max_parts, 8), dtype=np.int32)
    counts = np.zeros(6, dtype=np.int64)
    rc = lib.atpu_flac_scan(
        _as_ptr(buf, ctypes.c_uint8), len(buf),
        stream_bps, stream_channels, max_samples,
        max_frames, max_parts, 1 if verify_crc else 0,
        int(chunk_codes),
        _as_ptr(frame_meta, ctypes.c_int32),
        _as_ptr(sub_meta, ctypes.c_int32),
        _as_ptr(warmup, ctypes.c_int32),
        _as_ptr(qlp, ctypes.c_int32),
        _as_ptr(part_meta, ctypes.c_int32),
        _as_ptr(counts, ctypes.c_int64))
    if rc == -30:
        raise CapacityError("frame exceeds scan partition capacity")
    if rc < 0:
        raise ValueError("truncated or corrupt FLAC stream "
                         "(native code %d)" % (rc,))
    (n_frames, n_subs, n_parts, consumed, total_pcm, _) = counts
    return {
        "frame_meta": frame_meta[:n_frames],
        "sub_meta": sub_meta[:n_subs],
        "warmup": warmup[:n_subs],
        "qlp": qlp[:n_subs],
        "part_meta": part_meta[:n_parts],
        "consumed_bytes": int(consumed),
        "total_pcm_frames": int(total_pcm),
    }


class CapacityError(ValueError):
    """a single FLAC frame exceeded the scan's partition capacity;
    the caller decodes that stream on the host path instead"""


def pack_pcm(samples, bits_per_sample, big_endian, is_signed):
    """int32 [frames, channels] -> packed bytes (native)

    16-bit signed (the dominant layout) goes through numpy's SIMD
    converter; the scalar C loop remains the generic fallback"""
    import numpy as np
    if bits_per_sample == 16 and is_signed:
        dt = ">i2" if big_endian else "<i2"
        return np.ascontiguousarray(
            samples, dtype=np.int32).astype(dt).tobytes()
    lib = get_lib()
    samples = np.ascontiguousarray(samples, dtype=np.int32)
    n = samples.size
    out = np.empty(n * (bits_per_sample // 8), dtype=np.uint8)
    lib.atpu_pack_pcm(_as_ptr(samples, ctypes.c_int32), n,
                      bits_per_sample // 8,
                      1 if big_endian else 0,
                      1 if is_signed else 0,
                      _as_ptr(out, ctypes.c_uint8))
    return out.tobytes()


def unpack_pcm(data, bits_per_sample, big_endian, is_signed):
    """packed bytes -> int32 samples (native)

    the dominant layouts go through numpy's SIMD converters (~10x the
    scalar C byte loop, which remains the generic fallback)"""
    import numpy as np
    if bits_per_sample == 16 and is_signed:
        dt = ">i2" if big_endian else "<i2"
        usable = len(data) - (len(data) % 2)
        return np.frombuffer(data[:usable], dtype=dt).astype(np.int32)
    if bits_per_sample == 8:
        if is_signed:
            return np.frombuffer(data, dtype=np.int8).astype(np.int32)
        return np.frombuffer(data, dtype=np.uint8).astype(np.int32) - 128
    lib = get_lib()
    buf = np.frombuffer(data, dtype=np.uint8)
    n = len(buf) // (bits_per_sample // 8)
    out = np.empty(n, dtype=np.int32)
    lib.atpu_unpack_pcm(_as_ptr(buf, ctypes.c_uint8), n,
                        bits_per_sample // 8,
                        1 if big_endian else 0,
                        1 if is_signed else 0,
                        _as_ptr(out, ctypes.c_int32))
    return out


def shn_encode(samples, bps, signed_samples, is_big_endian,
               header_data, footer_data=b"", block_size=256,
               decisions=None):
    """encodes a complete Shorten stream from int32 [n, ch] PCM

    decisions: optional int32 [nblocks, ch, 4] analysis steering
    (ops/shn_scan.py layout); None computes decisions in C++"""
    import numpy as np
    lib = get_lib()
    samples = np.ascontiguousarray(samples, dtype=np.int32)
    (n, ch) = samples.shape
    header = np.frombuffer(bytes(header_data), dtype=np.uint8)
    footer = np.frombuffer(bytes(footer_data), dtype=np.uint8)
    worst = (samples.size * ((bps // 8) + 2) +
             8 * (len(header) + len(footer)) + 4096)
    out = np.empty(worst, dtype=np.uint8)
    if decisions is not None:
        decisions = np.ascontiguousarray(decisions, dtype=np.int32)
        nblocks = -(-n // block_size) if block_size else 0
        if decisions.shape != (nblocks, ch, 4):
            raise ValueError("decision array shape mismatch")
        dec_ptr = _as_ptr(decisions, ctypes.c_int32)
    else:
        dec_ptr = ctypes.POINTER(ctypes.c_int32)()
    total = lib.atpu_shn_encode2(
        _as_ptr(samples, ctypes.c_int32), n, ch, bps,
        1 if signed_samples else 0,
        1 if is_big_endian else 0,
        _as_ptr(header, ctypes.c_uint8), len(header),
        _as_ptr(footer, ctypes.c_uint8), len(footer),
        block_size,
        dec_ptr,
        _as_ptr(out, ctypes.c_uint8))
    if total < 0:
        raise ValueError("Shorten encode error (code %d)" % (total,))
    return out[:total].tobytes()


def shn_decode(data, max_frames, channels):
    """decodes a complete Shorten stream

    returns (samples int32 [frames, channels], file_type, bps)"""
    import numpy as np
    lib = get_lib()
    buf = np.frombuffer(bytes(data), dtype=np.uint8)
    info = np.zeros(4, dtype=np.int64)
    out = np.empty(max_frames * channels, dtype=np.int32)
    frames = lib.atpu_shn_decode(
        _as_ptr(buf, ctypes.c_uint8), len(buf), max_frames,
        _as_ptr(out, ctypes.c_int32),
        _as_ptr(info, ctypes.c_int64))
    if frames < 0:
        raise ValueError("truncated or corrupt Shorten stream "
                         "(native code %d)" % (frames,))
    channels = int(info[0])
    return (out[:frames * channels].reshape(-1, channels),
            int(info[1]), int(info[3]))


class ShnDeviceUnsupported(ValueError):
    """the Shorten stream uses features (QLPC, DIFF0-with-means,
    energy > 30) the device decode path does not cover; callers
    decode on the host path instead"""


def shn_scan(data, max_rows=None, max_block=None):
    """residual-only entropy scan for the SHN device decode path

    returns (residuals int32 [rows, max_block],
             row_meta int32 [rows, 4] {cmd, block_len, shift, chan},
             info dict) or raises ShnDeviceUnsupported"""
    import numpy as np
    lib = get_lib()
    buf = np.frombuffer(bytes(data), dtype=np.uint8)
    if max_block is None or max_rows is None:
        # peek the header's block_size to size the row planes (a
        # mid-stream FN_BLOCKSIZE beyond it returns -81 -> host path)
        from ..bitstream import BitstreamReader
        r = BitstreamReader(bytes(data[:4096]), False)
        if r.read_bytes(4) != b"ajkg" or r.read(8) != 2:
            raise ValueError("invalid Shorten magic")

        def _uns(c):
            return (r.unary(1) << c) | r.read(c)

        def _long():
            return _uns(_uns(2))

        _long()                                  # file_type
        _long()                                  # channels
        hdr_block = max(int(_long()), 1)
        if max_block is None:
            max_block = hdr_block
        if max_rows is None:
            # every residual costs >= 1 bit, so the stream length
            # bounds rows at 8*len/block (+ slack for short blocks);
            # FN_ZERO blocks cost only ~3 bits though, so -81
            # capacity overflows retry below with 8x more rows (up
            # to a ~512 MB residual-plane cap) before giving up
            max_rows = (len(buf) * 8) // hdr_block + 256
    row_cap = max((1 << 27) // max(max_block, 1), 1024)
    rows = -81
    while True:
        residuals = np.empty((max_rows, max_block), dtype=np.int32)
        row_meta = np.empty((max_rows, 4), dtype=np.int32)
        info = np.zeros(5, dtype=np.int64)
        rows = lib.atpu_shn_scan(
            _as_ptr(buf, ctypes.c_uint8), len(buf),
            max_rows, max_block,
            _as_ptr(residuals, ctypes.c_int32),
            _as_ptr(row_meta, ctypes.c_int32),
            _as_ptr(info, ctypes.c_int64))
        if rows == -81 and max_rows < row_cap:
            max_rows = min(max_rows * 8, row_cap)
            continue
        break
    if rows == -80 or rows == -81:
        raise ShnDeviceUnsupported(
            "stream outside device decode coverage (code %d)"
            % (rows,))
    if rows < 0:
        raise ValueError("truncated or corrupt Shorten stream "
                         "(native code %d)" % (rows,))
    return (residuals[:rows], row_meta[:rows], {
        "channels": int(info[0]),
        "file_type": int(info[1]),
        "bps": int(info[2]),
        "sign_adjustment": int(info[3]),
        "total_frames": int(info[4]),
    })


def flac_qplan_t(blocks, bps, guard=None, cap_margin=None,
                 noise_extra=0):
    """per-(block, channel) quantization shift t ONLY (no bit
    packing): the C++ first/second-difference scan behind the qpack
    wire (spec ops/qpack.plan_t).  The floor-retry stage-1 check
    needs the BASE plan (noise_extra=0) next to the wire's adaptive
    plan — in C++ this is ~4 ms per 512-block batch where the numpy
    spec costs ~175 ms (it was the encode pipeline's largest single
    CPU sink when the adaptive default landed)."""
    import numpy as np

    from ..ops import qpack as _qpack
    if guard is None:
        guard = _qpack.guard_bits()
    if cap_margin is None:
        cap_margin = _qpack.cap_margin()

    lib = get_lib()
    blocks = np.ascontiguousarray(blocks, dtype=np.int32)
    (B, n, ch) = blocks.shape
    t = np.empty((B, ch), dtype=np.int32)
    x0 = np.empty((B, ch), dtype=np.int32)
    or_vals = np.empty((B, ch), dtype=np.int32)
    const_flags = np.empty((B, ch), dtype=np.uint8)
    lib.atpu_flac_qplan(
        _as_ptr(blocks, ctypes.c_int32), B, n, ch,
        int(bps), int(guard), int(cap_margin), int(noise_extra),
        0,
        _as_ptr(t, ctypes.c_int32), _as_ptr(x0, ctypes.c_int32),
        _as_ptr(or_vals, ctypes.c_int32),
        _as_ptr(const_flags, ctypes.c_uint8),
        None)
    return t


def tta_scan_residuals(data, frame_lens, frame_sizes, channels,
                       verify_crc=True):
    """entropy-unpacks concatenated TTA frames (adaptive Rice +
    CRC-32) WITHOUT the filter chain — the device decode path's host
    half (ops/tta_synth.py inverts the filters)

    returns int32 [total, channels] residuals"""
    import numpy as np
    lib = get_lib()
    buf = np.frombuffer(bytes(data), dtype=np.uint8)
    frame_lens = np.ascontiguousarray(frame_lens, dtype=np.int64)
    frame_sizes = np.ascontiguousarray(frame_sizes, dtype=np.int32)
    total = int(frame_sizes.sum())
    out = np.empty((total, channels), dtype=np.int32)
    rc = lib.atpu_tta_scan_residuals(
        _as_ptr(buf, ctypes.c_uint8), len(buf),
        _as_ptr(frame_lens, ctypes.c_int64),
        _as_ptr(frame_sizes, ctypes.c_int32),
        len(frame_sizes), channels,
        _as_ptr(out, ctypes.c_int32),
        1 if verify_crc else 0)
    if rc < 0:
        raise ValueError("truncated or corrupt TTA stream "
                         "(native code %d)" % (rc,))
    return out


def tta_encode_frames(samples, frame_sizes, channels, bps):
    """encodes TTA frames from int32 [total, ch] PCM

    returns (bytes, per-frame byte sizes int64 array)"""
    import numpy as np
    lib = get_lib()
    samples = np.ascontiguousarray(samples, dtype=np.int32)
    frame_sizes = np.ascontiguousarray(frame_sizes, dtype=np.int32)
    F = len(frame_sizes)
    worst = samples.size * ((bps // 8) + 2) + 64 * F + 1024
    out = np.empty(worst, dtype=np.uint8)
    out_ends = np.empty(F, dtype=np.int64)
    total = lib.atpu_tta_encode_frames(
        _as_ptr(samples, ctypes.c_int32),
        _as_ptr(frame_sizes, ctypes.c_int32),
        F, channels, bps,
        _as_ptr(out, ctypes.c_uint8),
        _as_ptr(out_ends, ctypes.c_int64))
    if total < 0:
        raise ValueError("TTA encode error (code %d)" % (total,))
    lens = np.diff(np.concatenate([[0], out_ends]))
    return (out[:total].tobytes(), lens)


def tta_pack_frames(residuals, frame_sizes, channels):
    """packs precomputed TTA filter residuals (the device analysis
    path) with the adaptive Rice coder + per-frame CRC-32

    residuals: int32 [total, ch]; returns (bytes, per-frame sizes)"""
    import numpy as np
    lib = get_lib()
    residuals = np.ascontiguousarray(residuals, dtype=np.int32)
    frame_sizes = np.ascontiguousarray(frame_sizes, dtype=np.int32)
    F = len(frame_sizes)
    worst = residuals.size * 6 + 64 * F + 1024
    out = np.empty(worst, dtype=np.uint8)
    out_ends = np.empty(F, dtype=np.int64)
    total = lib.atpu_tta_pack_frames(
        _as_ptr(residuals, ctypes.c_int32),
        _as_ptr(frame_sizes, ctypes.c_int32),
        F, channels,
        _as_ptr(out, ctypes.c_uint8),
        _as_ptr(out_ends, ctypes.c_int64))
    if total < 0:
        raise ValueError("TTA pack error (code %d)" % (total,))
    lens = np.diff(np.concatenate([[0], out_ends]))
    return (out[:total].tobytes(), lens)


def tta_decode_frame(data, n, channels, bps, verify_crc=True):
    """decodes one TTA frame of n PCM frames

    returns (samples int32 [n, ch], consumed_bytes)"""
    import numpy as np
    lib = get_lib()
    buf = np.frombuffer(bytes(data), dtype=np.uint8)
    out = np.empty(n * channels, dtype=np.int32)
    consumed = lib.atpu_tta_decode_frame(
        _as_ptr(buf, ctypes.c_uint8), len(buf), n, channels, bps,
        _as_ptr(out, ctypes.c_int32), 1 if verify_crc else 0)
    if consumed < 0:
        raise ValueError("truncated or corrupt TTA stream "
                         "(native code %d)" % (consumed,))
    return (out.reshape(n, channels), consumed)


def verify_mpeg(data):
    """frame-walks an MPEG audio stream, validating headers

    returns (frames, total_samples, sample_rate, channels, layer);
    raises ValueError on corruption"""
    import numpy as np
    lib = get_lib()
    buf = np.frombuffer(bytes(data), dtype=np.uint8)
    info = np.zeros(4, dtype=np.int64)
    frames = lib.atpu_verify_mpeg(
        _as_ptr(buf, ctypes.c_uint8), len(buf),
        _as_ptr(info, ctypes.c_int64))
    if frames < 0:
        raise ValueError("MPEG stream error (code %d)" % (frames,))
    return (int(frames), int(info[0]), int(info[1]), int(info[2]),
            int(info[3]))


def ogg_crc(data, initial=0):
    """Ogg page CRC-32 (poly 0x04C11DB7, init 0, no final xor)"""
    import numpy as np
    lib = get_lib()
    buf = np.frombuffer(bytes(data), dtype=np.uint8)
    return int(lib.atpu_ogg_crc(_as_ptr(buf, ctypes.c_uint8),
                                len(buf), initial))


class MD5:
    """a hashlib-like MD5 which hashes int32 PCM without byte copies"""

    def __init__(self):
        import numpy as np
        self._state = np.zeros(128, dtype=np.uint8)
        self._lib = get_lib()
        self._lib.atpu_md5_init(_as_ptr(self._state, ctypes.c_uint8))

    def update(self, data):
        import numpy as np
        buf = np.frombuffer(data, dtype=np.uint8)
        self._lib.atpu_md5_update(
            _as_ptr(self._state, ctypes.c_uint8),
            _as_ptr(buf, ctypes.c_uint8), len(buf))

    def update_pcm(self, samples, bits_per_sample, is_signed=True):
        """hashes int32 samples as packed little-endian PCM"""
        import numpy as np
        samples = np.ascontiguousarray(samples, dtype=np.int32)
        self._lib.atpu_md5_update_pcm(
            _as_ptr(self._state, ctypes.c_uint8),
            _as_ptr(samples, ctypes.c_int32),
            samples.size, bits_per_sample // 8,
            1 if is_signed else 0)

    def digest(self):
        import numpy as np
        out = np.zeros(16, dtype=np.uint8)
        self._lib.atpu_md5_final(
            _as_ptr(self._state, ctypes.c_uint8),
            _as_ptr(out, ctypes.c_uint8))
        return out.tobytes()


_MLP_ERRORS = {
    -1: "invalid MLP stream data",
    -2: "parity mismatch decoding MLP substream",
    -3: "CRC8 mismatch decoding MLP substream",
    -4: "I/O error reading MLP stream",
    -6: "invalid MLP major sync",
}


class MLPDecoderHandle:
    """a stateful native MLP decoder context

    decode(data) consumes every whole length-prefixed frame in data
    and returns (samples int32 [n, channels] in WAVE order,
    consumed_bytes); stream attributes appear after the first
    major sync"""

    def __init__(self):
        import numpy as np
        self._np = np
        self._lib = get_lib()
        self._ctx = self._lib.atpu_mlp_new()
        self.sample_rate = 0
        self.channels = 0
        self.bits_per_sample = 0

    def decode(self, data):
        np = self._np
        buf = np.frombuffer(bytes(data), dtype=np.uint8)
        # worst case ~2 PCM samples per stream byte at 6 channels;
        # retry bigger on overflow
        cap = max(len(buf) * 8, 1 << 16)
        info = np.zeros(4, dtype=np.int64)
        while True:
            out = np.empty(cap, dtype=np.int32)
            n = self._lib.atpu_mlp_decode(
                self._ctx, _as_ptr(buf, ctypes.c_uint8), len(buf),
                _as_ptr(out, ctypes.c_int32), cap,
                _as_ptr(info, ctypes.c_int64))
            if n == -5:         # output overflow: grow and retry
                cap *= 4
                continue
            if n < 0:
                raise ValueError(_MLP_ERRORS.get(
                    int(n), "MLP decode error (code %d)" % (n,)))
            break
        self.sample_rate = int(info[0])
        self.channels = int(info[1])
        self.bits_per_sample = int(info[2])
        consumed = int(info[3])
        channels = max(self.channels, 1)
        return (out[:n * channels].reshape(-1, channels), consumed)

    def close(self):
        if self._ctx is not None:
            self._lib.atpu_mlp_free(self._ctx)
            self._ctx = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def shn_split(data):
    """returns the (head, tail) VERBATIM container bytes of a
    Shorten stream without decoding samples"""
    import numpy as np
    lib = get_lib()
    buf = np.frombuffer(bytes(data), dtype=np.uint8)
    cap = max(len(buf), 1 << 16)
    head = np.empty(cap, dtype=np.uint8)
    tail = np.empty(cap, dtype=np.uint8)
    sizes = np.zeros(2, dtype=np.int64)
    rc = lib.atpu_shn_split(
        _as_ptr(buf, ctypes.c_uint8), len(buf),
        _as_ptr(head, ctypes.c_uint8), cap,
        _as_ptr(tail, ctypes.c_uint8), cap,
        _as_ptr(sizes, ctypes.c_int64))
    if rc < 0:
        raise ValueError("truncated or corrupt Shorten stream "
                         "(native code %d)" % (rc,))
    return (head[:sizes[0]].tobytes(), tail[:sizes[1]].tobytes())
