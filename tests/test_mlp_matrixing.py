"""MLP rematrixing edge semantics validated through INDEPENDENT
formulations of the reference's arithmetic (mlp.c:1060-1106):

* ``mask(x, q) = (x >> q) << q`` must equal the two's-complement
  bit-clear ``x & ~((1 << q) - 1)`` for negative x too,
* the ``sum >> 14`` scale must be floor division (not truncation),
* the noise LFSR (seed' = ((seed << 16) & 0xFFFFFFFF) ^ shifted ^
  (shifted << 5), shifted = (seed >> 7) & 0xFFFF) must produce
  int8-cast channels scaled by noise_shift, checked against an
  independently-written generator and against hand-computed values.

These are the decisions a reimplementation most easily gets wrong
(Python % vs C casts); ref/mlp.py's versions are held to them here
without reusing its code."""

import numpy as np

from audiotools_tpu.ref import mlp as ref_mlp


def _independent_noise(seed, n, shift):
    """noise generator written from the mlp.c spec with numpy int8
    casts (a different mechanism than ref/mlp.py's manual wrap)"""
    out0 = []
    out1 = []
    s = seed & 0xFFFFFFFF
    for _ in range(n):
        shifted = (s >> 7) & 0xFFFF
        out0.append(
            int(np.uint8((s >> 15) & 0xFF).view(np.int8)) << shift)
        out1.append(
            int(np.uint8(shifted & 0xFF).view(np.int8)) << shift)
        s = (((s << 16) & 0xFFFFFFFF) ^ shifted ^
             (shifted << 5)) & 0xFFFFFFFF
    return (out0, out1, s)


class _SS:
    pass


def _run_ref_rematrix(channels, seed, shift, coeffs, out_channel,
                      qss, bypassed):
    ss = _SS()
    ss.noise_gen_seed = seed
    ss.noise_shift = shift
    ss.max_matrix_channel = len(channels) - 1

    class _M:
        pass
    m = _M()
    m.coeff = coeffs
    m.out_channel = out_channel
    m.bypassed_LSB = bypassed
    ss.matrix = [m]
    ss.quant_step_size = qss
    chs = [list(c) for c in channels]
    ref_mlp.MLPDecoder._rematrix(chs, ss)
    return (chs, ss.noise_gen_seed)


def test_mask_equals_bit_clear_for_negatives():
    for q in range(0, 9):
        for x in list(range(-70000, 70000, 777)) + [-1, -(1 << 20)]:
            shifted = (x >> q) << q if q else x
            cleared = x & ~((1 << q) - 1)
            assert shifted == cleared, (x, q)


def test_noise_generator_matches_independent_form():
    for (seed, shift) in [(0, 0), (1, 0), (0x12345678, 3),
                          (0xFFFFFFFF, 7), (0x80000000, 1)]:
        (n0, n1, s_end) = _independent_noise(seed, 64, shift)
        # drive ref/mlp's generator through a 1-channel rematrix with
        # coeff pattern selecting ONLY the noise channels:
        # out = mask((n0*2^14 ) >> 14, 0) + 0  = n0
        zeros = [0] * 64
        (chs, seed_out) = _run_ref_rematrix(
            [zeros], seed, shift, [0, 1 << 14, 0], 0, [0], zeros)
        assert chs[0] == n0
        assert seed_out == s_end
        (chs1, _s) = _run_ref_rematrix(
            [zeros], seed, shift, [0, 0, 1 << 14], 0, [0], zeros)
        assert chs1[0] == n1


def test_scale_is_floor_not_truncation():
    """sum >> 14 on a negative sum floors: channel value -1 with
    coeff 1 gives sum = -1 -> out = -1 >> 14 = -1 (truncation would
    give 0)"""
    zeros = [0] * 4
    (chs, _s) = _run_ref_rematrix(
        [[-1, -16383, -16384, -16385]], 0, 0,
        [1, 0, 0], 0, [0], zeros)
    assert chs[0] == [-1, -1, -1, -2]


def test_mask_and_bypassed_lsb_combine():
    """out = mask(sum >> 14, q) + bypassed_LSB, with q clearing low
    bits BEFORE the LSB add (reference order)"""
    vals = [12345, -12345, 7, -7]
    byp = [1, 2, 3, 0]
    q = 3
    (chs, _s) = _run_ref_rematrix(
        [[v << 14 for v in vals]], 0, 0, [1, 0, 0], 0, [q], byp)
    expect = [(v & ~((1 << q) - 1)) + b for (v, b) in zip(vals, byp)]
    assert chs[0] == expect
