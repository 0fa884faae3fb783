"""Scalar LPC analysis primitives — the oracle's INDEPENDENT numerics.

Re-derives the FLAC/ALAC LPC analysis chain (window ->
autocorrelation -> Levinson-Durbin -> error-feedback quantization ->
order estimate) as straight-line scalar loops over one subframe at a
time, matching the reference algorithms
(``/root/reference/audiotools/py_encoders/flac.py:565-737``) under the
framework's bit-determinism spec — with **zero imports from ops/**, so
a bug in the batched kernels cannot hide behind a shared
implementation (the dual-implementation pattern of the reference's
``py_encoders`` vs ``src/encoders``, SURVEY.md §2.2).

The numerical spec both implementations satisfy (and which makes a
scalar loop and a batched array program bit-identical):

* float *products* only ever multiply two f32-valued (<= 24-bit
  mantissa) or integer (< 2^26) operands, so the f64 product is exact
* every mul/add/div result is immediately re-rounded to f32 precision
  (``f32r``); single-op round-then-reduce is identical under IEEE f64
* the windowed autocorrelation quantizes windowed samples to integers
  sized so products and whole-block sums stay below 2^47 — exact
  integer sums in ANY order
* powers of two come from ``math.ldexp`` (exact construction) and
  log outputs are immediately f32-rounded

Every constant here (the 17-bit pre-shift, the 47-bit sum budget, the
f32 re-round points) is part of the codec's *decision spec*: both
implementations must follow it or their streams differ (losslessly —
decisions only steer encoding — but byte-compare tests enforce
identity).
"""

from __future__ import annotations

import math

import numpy as np

_window_cache = {}


def f32r(x):
    """rounds one f64 value to f32 precision (returned as float)"""
    return float(np.float64(np.float32(x)))


def exp2i(e):
    """exact 2^e for integer e, clamped to the f64 normal range"""
    return math.ldexp(1.0, max(-1022, min(1023, int(e))))


def tukey_window(n, alpha=0.5):
    """the tukey window exactly as the reference computes it
    (py_encoders/flac.py:565-582); float64 ndarray, cached"""
    key = (n, alpha)
    if key not in _window_cache:
        window1 = (alpha * (n - 1)) / 2
        window2 = (n - 1) * (1 - (alpha / 2))
        out = np.empty(n, dtype=np.float64)
        for i in range(n):
            if i <= window1:
                out[i] = 0.5 * (1 + np.cos(
                    np.pi * (((2 * i) / (alpha * (n - 1))) - 1)))
            elif i <= window2:
                out[i] = 1.0
            else:
                out[i] = 0.5 * (1 + np.cos(
                    np.pi * (((2 * i) / (alpha * (n - 1))) -
                             (2 / alpha) + 1)))
        _window_cache[key] = out
    return _window_cache[key]


def windowed_autocorr(x, window, max_order):
    """windowed autocorrelation of one subframe, spec numerics

    x: int array [n] (post-wasted-shift); window: f64 [n]
    returns list of max_order+1 floats

    samples pre-shift to 17 bits, the windowed values quantize to
    integers sized so lag products and sums stay below 2^47 (exact in
    any summation order), and the exact power-of-two scale is restored
    afterwards."""
    n = len(x)
    w = np.asarray(window, dtype=np.float64).astype(
        np.float32).astype(np.float64)
    amax = int(np.max(np.abs(x))) if n else 0
    pre = max(amax.bit_length() - 17, 0)
    xs = (np.asarray(x, dtype=np.int64) >> pre).astype(np.float64)
    windowed = xs * w                                   # exact products
    nb = 1
    while (1 << nb) < n:
        nb += 1
    m = min((47 - nb) // 2, 23)
    shift2 = m - 17
    wq = np.floor(windowed * exp2i(shift2) + 0.5)
    scale = exp2i(2 * (pre - shift2))
    return [float(np.sum(wq[:n - lag] * wq[lag:]) * scale)
            for lag in range(max_order + 1)]


def levinson(ac, max_order):
    """scalar Levinson-Durbin recursion under the f32-re-round spec

    ac: list of max_order+1 floats
    returns (rows, errors): rows[o-1][:o] are the order-o LP
    coefficients, errors[o-1] the order-o prediction error.
    Degenerate divisions (zero denominator) continue with ki = 0."""
    K = max_order
    ac = [f32r(v) for v in ac]
    r0 = ac[0]
    k0 = f32r(ac[1] / r0) if r0 != 0.0 else 0.0
    rows = [[0.0] * K]
    rows[0][0] = k0
    errors = [f32r(ac[0] * f32r(1.0 - f32r(k0 * k0)))]
    for i in range(1, K):
        prev = rows[i - 1]
        acc = 0.0
        for j in range(i):
            acc = f32r(acc + f32r(prev[j] * ac[i - j]))
        err_prev = errors[i - 1]
        ki = (f32r((ac[i + 1] - acc) / err_prev)
              if err_prev != 0.0 else 0.0)
        row = [0.0] * K
        for j in range(i):
            row[j] = f32r(prev[j] - f32r(ki * prev[i - 1 - j]))
        row[i] = ki
        rows.append(row)
        errors.append(f32r(err_prev * f32r(1.0 - f32r(ki * ki))))
    return (rows, errors)


def ilog2_trunc(v):
    """exact int(log2(v)) truncated toward zero for v > 0

    an approximate log2 seeds an exact floor corrected by exact
    power-of-two comparisons (same spec as the batched kernel)"""
    approx = float(np.floor(np.log2(v)))
    if exp2i(approx + 1.0) <= v:
        approx += 1.0
    if exp2i(approx) > v:
        approx -= 1.0
    exact_power = (exp2i(approx) == v)
    if (v >= 1.0) or exact_power:
        return int(approx)
    return int(approx) + 1


def quantize_coefficients(row, precision):
    """error-feedback quantization of one order's coefficients

    row: list of floats (the order-o Levinson row prefix)
    returns (qlp list of ints, shift int); mirrors the reference's C
    (production) encoder, src/encoders/flac.c:1271-1325: the shift
    comes from frexp's exponent (the Python mirror's int(log2(l))
    form over-shifts for coefficients in [1, 2) and clamps the lead
    coefficient — ~40-90% worse on tonal content), rounding is C
    round() (half away from zero), and the error feedback subtracts
    the UNCLAMPED rounded value; negative shifts scale coefficients
    down and emit shift 0"""
    import math

    order = len(row)
    l = max(abs(c) for c in row) if order else 0.0
    if l > 0.0:
        (_m, e) = math.frexp(l)
        raw_shift = min(max((precision - 1) - (e - 1) - 1, -(1 << 4)),
                        (1 << 4) - 1)
    else:
        raw_shift = 0
    scale = exp2i(raw_shift)
    qlp_max = (1 << (precision - 1)) - 1
    qlp_min = -(1 << (precision - 1))
    error = 0.0
    qlp = []
    for j in range(order):
        candidate = f32r(error + row[j] * scale)
        rounded = math.copysign(
            math.floor(abs(candidate) + 0.5), candidate)
        q = min(max(rounded, qlp_min), qlp_max)
        error = candidate - rounded
        qlp.append(int(q))
    return (qlp, max(raw_shift, 0))


def estimate_best_lpc_order(errors, block_size, bits_per_sample,
                            qlp_precision, max_order):
    """log-domain order estimate (reference py_encoders/flac.py:676)

    errors: list of floats from levinson(); returns int order.
    Orders with error > 0 compete on estimated bits (strict <,
    earliest wins); the first order with error == 0.0 wins outright."""
    error_scale = float(np.float32(np.log(2) ** 2))
    inv_2log2 = float(np.float32(1.0 / (np.log(2) * 2)))
    best_order = 0
    best_bits = 1e32
    for i in range(max_order):
        order = i + 1
        err = errors[i]
        if err == 0.0:
            return order
        if err > 0.0:
            header_bits = order * (float(bits_per_sample) +
                                   qlp_precision)
            log_err = f32r(np.log(err * error_scale))
            bits_per_residual = f32r(max(log_err * inv_2log2, 0.0))
            estimated = header_bits + bits_per_residual * (
                block_size - order)
            if estimated < best_bits:
                best_order = order
                best_bits = estimated
    return best_order


def lpc_residuals_aligned(x, qlp, shift, clip_bits):
    """exact integer LPC residuals at absolute positions

    x: int64 array [n]; positions below the order are zero; residual
    magnitudes clip to +-2^clip_bits (degenerate-candidate bound —
    part of the decision spec, matching the batched kernels; the
    *written* residuals are re-derived exactly elsewhere)"""
    order = len(qlp)
    n = len(x)
    out = np.zeros(n, dtype=np.int64)
    if order == 0:
        out[:] = x
    else:
        pred = np.zeros(n - order, dtype=np.int64)
        for (j, q) in enumerate(qlp):
            pred += int(q) * x[order - 1 - j:n - 1 - j]
        out[order:] = x[order:] - (pred >> shift)
    bound = 1 << clip_bits
    return np.clip(out, -bound, bound)
