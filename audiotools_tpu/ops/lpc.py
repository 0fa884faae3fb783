"""Batched LPC analysis primitives, deterministic across backends.

These functions define the framework's *numerical spec* for FLAC/ALAC
LPC analysis (window -> autocorrelation -> Levinson-Durbin ->
error-feedback quantization), re-deriving the reference algorithms
(``/root/reference/audiotools/py_encoders/flac.py:565-737``) as batched
array programs with bit-deterministic semantics.

**Contraction immunity.**  XLA may fuse a multiply feeding an add into
a fused multiply-add (one rounding instead of two) or evaluate fused
regions at excess precision — observed under SPMD partitioning on CPU
— so "IEEE mul then IEEE add" is NOT a portable spec, and
optimization barriers do not reliably survive partitioning.  Instead
the pipeline is built so no optimization can change any value:

* every float *product* is EXACT: operands are kept at <= 26
  significant bits (f32-valued, or small integers), so the f64
  product has <= 52 mantissa bits and rounds to itself — an FMA
  contraction of ``a*b + c`` then rounds identically to the separate
  ops
* values re-enter the <= 26-bit domain via explicit precision
  reduction (``lax.reduce_precision`` / f32 casts), an HLO with
  defined semantics the compiler must honor
* additions are plain f64 adds in a fixed binary-tree order (adds
  cannot contract with adds), and integer-valued f64 sums below 2^53
  are exact in any order
* transcendental outputs (log) are immediately rounded to f32
  precision, collapsing sub-ulp libm/XLA differences

**float-float f64 (TPU x64 emulation).**  TPUs have no native f64;
XLA's x64 rewriter emulates it as a (hi, lo) *pair of f32s* (~49-bit
significand, non-IEEE rounding).  Measured consequences on real TPU
hardware: ``exp2`` of integral arguments is NOT exact, general
(non-integer) f64 add chains round differently than IEEE f64, and
f64 division is approximate.  The spec therefore tightens further:

* every value is either an INTEGER below 2^47 (exactly representable
  and exactly summable as two f32s, in any order) or an f32-VALUED
  float (lo half zero); products of two f32-valued numbers (<= 48
  mantissa bits) and sums of two f32-valued numbers (<= 49 bits) are
  exact in float-float via two-product/two-sum, so rounding them back
  to f32 matches IEEE f64 bit-for-bit
* powers of two come from ``exact_exp2`` (IEEE-754 bit construction,
  never the transcendental ``exp2``)
* the windowed autocorrelation quantizes windowed samples to
  integers so its lag sums are exact integer sums, immune to any
  reduction reordering or fusion
* the one remaining approximation is division (Levinson's reflection
  coefficients): both backends round the quotient to f32, which can
  differ only when the emulation's ~2^-49 quotient error straddles an
  f32 rounding boundary (~2^-25 per division; decisions only steer
  encoding, losslessness is unaffected)

All functions take an ``xp`` module (numpy or jax.numpy) and operate on
arrays whose leading dimensions are batch dims.
"""

from __future__ import annotations

import numpy as np

_window_cache = {}


def f32round(xp, x):
    """explicitly rounds f64 values to f32 precision (keeping f64 type)

    This is the spec's precision-reduction primitive: products of two
    f32-valued f64 numbers are exact in f64, which makes every
    multiply-add chain immune to FMA contraction and excess-precision
    evaluation (see module docstring).

    Implemented as convert-to-f32 / convert-back (lowerable on every
    backend — TPU's x64 rewriter cannot lower f64 reduce_precision)
    with an optimization barrier between the converts so
    allow-excess-precision cannot elide the downcast/upcast pair."""
    if xp is np:
        return x.astype(np.float32).astype(np.float64)
    import jax.lax
    y = x.astype(xp.float32)
    y = jax.lax.optimization_barrier(y)
    return y.astype(xp.float64)


def tukey_window(n, alpha=0.5):
    """the tukey window exactly as the reference computes it
    (py_encoders/flac.py:565-582); float64, computed once on host"""
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


def exact_exp2(xp, e):
    """exact 2^e for integer arrays, as float64

    Built from the IEEE-754 bit pattern ((e + 1023) << 52) rather than
    the transcendental ``exp2``, which is NOT exact for integral
    arguments on TPU backends (x64 float-float emulation).  Exponents
    clamp to the normal range [-1022, 1023]."""
    if xp is np:
        e = np.clip(np.asarray(e).astype(np.int64), -1022, 1023)
        return ((e + 1023) << 52).view(np.float64)
    import jax.lax
    e = xp.clip(xp.asarray(e).astype(xp.int64), -1022, 1023)
    return jax.lax.bitcast_convert_type((e + 1023) << 52, xp.float64)


def int_bit_length(xp, v):
    """bit_length of non-negative int32/int64 arrays (0 -> 0)

    pure integer compares — deterministic on every backend"""
    v = xp.asarray(v)
    out = xp.zeros(v.shape, dtype=xp.int32)
    for k in range(31):
        out = out + (v >= (1 << k)).astype(xp.int32)
    return out


def pairwise_sum(xp, x, axis=-1):
    """deterministic binary-tree sum along the given axis

    the reduction order depends only on the axis length, never on
    batch shape or backend, so results are bit-identical everywhere"""
    x = xp.moveaxis(x, axis, -1)
    n = x.shape[-1]
    if n == 0:
        return xp.zeros(x.shape[:-1], dtype=x.dtype)
    # pad to the next power of two with zeros (additive identity)
    p = 1
    while p < n:
        p <<= 1
    if p != n:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, p - n)]
        x = xp.pad(x, pad)
    while x.shape[-1] > 1:
        half = x.shape[-1] // 2
        x = x[..., :half] + x[..., half:]
    return x[..., 0]


def autocorrelation(xp, windowed, max_order):
    """batched autocorrelation over the last axis

    windowed: f64 [..., n]; returns f64 [..., max_order+1]"""
    n = windowed.shape[-1]
    lags = []
    for lag in range(max_order + 1):
        products = windowed[..., :n - lag] * windowed[..., lag:]
        lags.append(pairwise_sum(xp, products))
    return xp.stack(lags, axis=-1)


def windowed_autocorr(xp, samples, window, max_order):
    """the framework's TPU-native windowing+autocorrelation spec

    samples: int [..., n] (post-wasted-shift, |x| < 2^26);
    window: f64 [n] (rounded to f32 precision inside).

    Bit-deterministic across numpy / CPU XLA / TPU float-float f64 by
    keeping every lag sum an exact INTEGER sum: samples pre-shift to
    17 bits, the windowing product (int17 * f32-valued, <= 41 bits)
    is exact everywhere, and windowed values quantize to integers
    |wq| < 2^m with m sized so products (2^2m) and whole-block sums
    (2^(2m + log2 n)) stay below 2^47 — exactly representable and
    order-independent even in float-float, so a plain ``xp.sum``
    (which XLA lowers to a fast reduce) is safe.  The exact
    power-of-two scale is restored afterwards.  Analysis precision
    only steers *which* predictor is chosen (the emitters re-derive
    residuals exactly), so ~18-bit windowed samples cost ~nothing in
    ratio (the quantized-upload wire format already feeds analysis
    ~7-bit samples).

    returns f64 [..., max_order+1]"""
    n = samples.shape[-1]
    w = f32round(xp, xp.asarray(window, dtype=xp.float64))
    # per-row pre-shift so |xs| < 2^17 (exact integer ops)
    amax = xp.max(xp.abs(samples), axis=-1, keepdims=True)
    pre = xp.maximum(int_bit_length(xp, amax) - 17, 0)     # [..., 1]
    xs = samples >> pre
    windowed = xs.astype(xp.float64) * w                   # exact
    # static integer budget: 2*m + ceil(log2 n) <= 47
    nb = 1
    while (1 << nb) < n:
        nb += 1
    m = min((47 - nb) // 2, 23)
    shift2 = m - 17
    wq = xp.floor(windowed * float(exact_exp2(np, shift2)) + 0.5)
    lags = []
    for lag in range(max_order + 1):
        products = wq[..., :n - lag] * wq[..., lag:]
        lags.append(xp.sum(products, axis=-1))
    ac = xp.stack(lags, axis=-1)
    # restore scale: ac_true = ac * 2^(2*(pre - shift2))
    scale = exact_exp2(xp, 2 * (pre.astype(xp.int64) - shift2))
    return ac * scale


def lpc_residuals_i32(xp, samples, qlp, shifts, clip_bits):
    """batched integer LPC residuals for every order row, exact

    samples: int32 [S, n] (post-wasted-shift)
    qlp:     int32 [S, K, K] quantized coefficients (row o-1 = order o)
    shifts:  int32 [S, K]
    returns res int32 [S, K, n] with warm-up positions (< order) zeroed

    The prediction accumulator can exceed int32 (|q|<2^13, |x|<2^25),
    so samples split into hi/lo halves (x = hi*2^11 + lo, 0 <= lo <
    2^11) and accumulate separately in int32 — the O(K^2 n) hot loop
    stays native int32 on TPU (no float-float emulation).  The single
    per-element recombination floor(C / 2^s) with C = A*2^11 + B runs
    in f64: A*2^11 <= 2^(hi_bits+11) and |C| < 2^46 stay exactly
    representable even under float-float f64 (< 2^47), the
    exact_exp2 scale is exact, and floor is exact — so the result
    equals the true integer residual on every backend.  The caller
    guarantees the int32 ACCUMULATION cannot wrap (hi_bits <= 30,
    see lpc_residuals)."""
    S = samples.shape[0]
    n = samples.shape[1]
    K = qlp.shape[1]
    xhi = samples >> 11
    xlo = samples & 2047
    hi_pad = xp.pad(xhi, [(0, 0), (K, 0)])
    lo_pad = xp.pad(xlo, [(0, 0), (K, 0)])
    A = xp.zeros((S, K, n), dtype=xp.int32)
    Bv = xp.zeros((S, K, n), dtype=xp.int32)
    for j in range(K):
        # prediction for position i uses sample i-1-j
        q = qlp[:, :, j][:, :, None]
        A = A + q * hi_pad[:, None, K - 1 - j:K - 1 - j + n]
        Bv = Bv + q * lo_pad[:, None, K - 1 - j:K - 1 - j + n]
    scale = exact_exp2(xp, -shifts)[:, :, None]
    C = A.astype(xp.float64) * 2048.0 + Bv.astype(xp.float64)
    pred = xp.floor(C * scale)
    res = samples[:, None, :].astype(xp.float64) - pred
    # degenerate candidates (tiny shift, huge coeffs) can exceed the
    # downstream |residual| bound; clip instead of casting
    # out-of-range (float->int32 overflow is not
    # backend-deterministic), keeping such trials maximal-but-bounded
    # so they lose every argmin (same semantics as lpc_residuals_f64)
    bound = float(1 << clip_bits)
    res = xp.clip(res, -bound, bound)
    pos = xp.arange(n, dtype=xp.int32)[None, None, :]
    order_arr = xp.arange(1, K + 1, dtype=xp.int32)[None, :, None]
    return xp.where(pos < order_arr, 0.0, res).astype(xp.int32)


def lpc_residuals_f64(xp, samples, qlp, shifts, clip_bits):
    """batched integer LPC residuals via exact f64 accumulation

    The wide-bound path (whenever the hi/lo int32 scheme's
    intermediates could exceed int32 — e.g. ``A << (11 - s)`` reaches
    2^33 for 24-bit input with small shifts and wraps to an ALIASED
    SMALL residual, which under-sizes Rice parameters and explodes the
    emitters' unary coding): every product q * x is of integers below
    2^14 and 2^26, so the f64 product (< 2^40) is exact, the <= 32
    term sum stays below 2^45 — exact in any order even under TPU
    float-float f64 (representable bound ~2^47), immune to FMA
    contraction by exactness — and the arithmetic shift is an exact
    power-of-two scale (exact_exp2) + floor.

    Residuals beyond +-2^clip_bits (only reachable through degenerate
    predictor trials, never by a sane candidate) clip to the bound:
    float->int32 overflow casts are NOT backend-deterministic, and the
    clipped value keeps |residual| sums maximal-but-bounded so such
    candidates draw maximal Rice parameters and lose every argmin.
    Bit-deterministic on every backend; same semantics as
    ``lpc_residuals_i32`` within its exact range."""
    S = samples.shape[0]
    n = samples.shape[1]
    K = qlp.shape[1]
    x = samples.astype(xp.float64)
    x_pad = xp.pad(x, [(0, 0), (K, 0)])
    acc = xp.zeros((S, K, n), dtype=xp.float64)
    for j in range(K):
        q = qlp[:, :, j].astype(xp.float64)[:, :, None]
        acc = acc + q * x_pad[:, None, K - 1 - j:K - 1 - j + n]
    scale = exact_exp2(xp, -shifts)[:, :, None]
    pred = xp.floor(acc * scale)
    res = samples[:, None, :].astype(xp.float64) - pred
    bound = float(1 << clip_bits)
    res = xp.clip(res, -bound, bound)
    pos = xp.arange(n, dtype=xp.int32)[None, None, :]
    order_arr = xp.arange(1, K + 1, dtype=xp.int32)[None, :, None]
    return xp.where(pos < order_arr, 0.0, res).astype(xp.int32)


def lpc_residuals(xp, samples, qlp, shifts, value_bits, precision,
                  clip_bits):
    """dispatches between the int32 hi/lo and exact-f64 residual paths

    value_bits: static bound on bits of |samples| (bps + 1 for side
    channels, post-wasted-shift upper bound).  The int32 scheme is
    used only when its ACCUMULATORS cannot wrap:
    A = sum q*xhi bounded by K * 2^(precision-1) *
    2^(max(value_bits-11,0)) must stay below 2^31 (the recombination
    itself runs in exact f64, so no extra << 11 headroom is needed —
    16-bit stereo at precision 14 qualifies and keeps the O(K^2 n)
    hot loop in native TPU int32).  Otherwise the f64 path computes
    the true value exactly (products fit 2^53 / float-float 2^47 for
    all audio), clipped to +-2^clip_bits (see lpc_residuals_f64)."""
    K = qlp.shape[1]
    import math
    hi_bits = (math.ceil(math.log2(max(K, 1))) + (precision - 1) +
               max(value_bits - 11, 0))
    if hi_bits < 31:
        return lpc_residuals_i32(xp, samples, qlp, shifts, clip_bits)
    return lpc_residuals_f64(xp, samples, qlp, shifts, clip_bits)


def levinson(xp, autocorr, max_order):
    """batched Levinson-Durbin recursion

    autocorr: f64 [..., max_order+1]
    returns (coeffs f64 [..., max_order, max_order], errors
    f64 [..., max_order]) where coeffs[..., o-1, :o] are the LP
    coefficients for order o.

    rows whose autocorrelation is degenerate (zero lag-0 or a zero
    intermediate error) produce ki = 0 continuations rather than the
    reference's div-by-zero crash; callers mask those rows separately.

    Contraction-immune: the autocorrelation and every coefficient row
    are kept f32-valued (explicit precision reduction), so all
    products in the recursion are exact in f64 — no FMA contraction or
    excess-precision evaluation can change a value.  Divisions round
    once and are immediately reduced.
    """
    batch = autocorr.shape[:-1]
    autocorr = f32round(xp, autocorr)
    r0 = autocorr[..., 0]
    safe_r0 = xp.where(r0 == 0.0, 1.0, r0)
    k0 = f32round(xp, autocorr[..., 1] / safe_r0)
    k0 = xp.where(r0 == 0.0, 0.0, k0)

    # coeff rows built incrementally; store as list of per-order arrays
    coeff_rows = [xp.zeros(batch + (max_order,), dtype=xp.float64)]
    first = xp.zeros(batch + (max_order,), dtype=xp.float64)
    first = _set_col(xp, first, 0, k0)
    coeff_rows[0] = first
    # every mul/add is a SINGLE op on f32-valued operands followed by
    # an immediate f32 re-round: such ops round identically under IEEE
    # f64 and the TPU's float-float emulation (exact two-product/
    # two-sum, then one rounding); multi-op chains would not
    kk0 = f32round(xp, k0 * k0)
    errors = [f32round(xp, autocorr[..., 0] * f32round(xp, 1 - kk0))]

    for i in range(1, max_order):
        prev = coeff_rows[i - 1]
        # acc = sum_j prev[j] * autocorr[i - j]
        acc = xp.zeros(batch, dtype=xp.float64)
        for j in range(i):
            p = f32round(xp, prev[..., j] * autocorr[..., i - j])
            acc = f32round(xp, acc + p)
        err_prev = errors[i - 1]
        safe_err = xp.where(err_prev == 0.0, 1.0, err_prev)
        ki = f32round(xp, (autocorr[..., i + 1] - acc) / safe_err)
        ki = xp.where(err_prev == 0.0, 0.0, ki)

        # new row: prev[j] - ki * prev[i-1-j] for j < i, then ki
        row = xp.zeros(batch + (max_order,), dtype=xp.float64)
        for j in range(i):
            t = f32round(xp, ki * prev[..., i - 1 - j])
            row = _set_col(xp, row, j,
                           f32round(xp, prev[..., j] - t))
        row = _set_col(xp, row, i, ki)
        coeff_rows.append(row)
        kk = f32round(xp, ki * ki)
        errors.append(f32round(xp, err_prev * f32round(xp, 1 - kk)))

    return (xp.stack(coeff_rows, axis=-2), xp.stack(errors, axis=-1))


def _set_col(xp, arr, col, values):
    """sets arr[..., col] = values, backend-agnostic"""
    if xp is np:
        arr = arr.copy() if not arr.flags.writeable else arr
        arr[..., col] = values
        return arr
    else:
        return arr.at[..., col].set(values)


def ilog2_trunc(xp, values):
    """exact int(log2(v)) truncated toward zero for v > 0

    deterministic across backends: an approximate log2 seeds an exact
    floor which is then corrected with exact power-of-two comparisons
    (powers of two from exact_exp2 — the transcendental exp2 is NOT
    exact for integral args under TPU float-float f64)"""
    approx = xp.floor(xp.log2(values))
    # correct the floor estimate by at most one step each way
    approx = xp.where(
        exact_exp2(xp, approx + 1.0) <= values, approx + 1.0, approx)
    approx = xp.where(
        exact_exp2(xp, approx) > values, approx - 1.0, approx)
    exact_power = exact_exp2(xp, approx) == values
    # truncation toward zero: for v >= 1 trunc == floor; for v < 1
    # (log2 < 0) trunc == floor + 1 unless v is an exact power of two
    trunc = xp.where((values >= 1.0) | exact_power, approx, approx + 1.0)
    return trunc.astype(xp.int32)


def frexp_exponent(xp, values):
    """exact frexp exponent for v > 0: e with v = m * 2^e, m in
    [0.5, 1) — i.e. floor(log2(v)) + 1

    Same exact-correction construction as ilog2_trunc; xp.frexp itself
    is unusable on device (its s64 bitcast is rejected by the TPU X64
    rewriter)."""
    approx = xp.floor(xp.log2(values))
    approx = xp.where(
        exact_exp2(xp, approx + 1.0) <= values, approx + 1.0, approx)
    approx = xp.where(
        exact_exp2(xp, approx) > values, approx - 1.0, approx)
    # v == 2^k has floor(log2) == k and frexp exponent k + 1
    return (approx + 1.0).astype(xp.int32)


def quantize_all_orders(xp, coeffs, precision):
    """batched error-feedback coefficient quantization for every order

    coeffs: f64 [..., K, K] from levinson()
    returns (qlp int32 [..., K, K], shifts int32 [..., K]) where row
    o-1 holds the order-o quantized coefficients; mirrors reference
    py_encoders/flac.py:702-737 (negative shifts clamp to 0 with
    coefficients divided instead)
    """
    K = coeffs.shape[-1]
    # max |coeff| per order row, over the valid prefix
    order_idx = xp.arange(K)
    valid = order_idx[None, :] <= order_idx[:, None]      # [K, K]
    abs_coeffs = xp.abs(coeffs)
    masked = xp.where(valid, abs_coeffs, 0.0)
    l = xp.max(masked, axis=-1)                           # [..., K]

    has_l = l > 0
    safe_l = xp.where(has_l, l, 1.0)
    # frexp exponent (reference src/encoders/flac.c:1294 frexp):
    # l = m * 2^e with m in [0.5, 1).  NOT int(log2(l)): for
    # coefficients in [1, 2) — every near-unit-circle predictor, i.e.
    # all tonal content — the log-trunc form (the reference's PYTHON
    # mirror, py_encoders/flac.py:710) over-shifts by one and clamps
    # the lead coefficient at the precision boundary, costing ~40-90%
    # compression on pure tones.  The C encoder that produced the
    # reference corpus uses frexp; this framework follows the C
    # (production) semantics.
    e = frexp_exponent(xp, safe_l)
    raw_shift = xp.clip((precision - 1) - (e - 1) - 1,
                        -(1 << 4), (1 << 4) - 1)
    raw_shift = xp.where(has_l, raw_shift, 0)

    # effective multiplier: 2^shift for shift >= 0, else 1/2^-shift
    # with the emitted shift clamped to 0
    shift_nonneg = xp.maximum(raw_shift, 0)
    # exact_exp2 covers negatives directly (2^-k is exact), so no
    # reciprocal needed
    scale = exact_exp2(xp, raw_shift)

    qlp_max = (1 << (precision - 1)) - 1
    qlp_min = -(1 << (precision - 1))

    error = xp.zeros(l.shape, dtype=xp.float64)
    cols = []
    for j in range(K):
        # scale is an exact power of two, so the product is exact
        # (contraction-immune); the candidate re-rounds to f32 so the
        # integer rounding below sees an identical f32-valued input
        # under IEEE f64 and float-float alike
        contribution = coeffs[..., j] * scale                # [..., K]
        active = valid[:, j]                                 # [K]
        error_candidate = f32round(xp, error + contribution)
        # C semantics: round half away from zero (C round()), and the
        # error feedback subtracts the UNCLAMPED rounded value
        # (src/encoders/flac.c:1308-1311) — exact: candidate is
        # f32-valued, so |x| + 0.5 and the floor are exact in f64
        rounded = xp.sign(error_candidate) * xp.floor(
            xp.abs(error_candidate) + 0.5)
        q = xp.clip(rounded, qlp_min, qlp_max)
        new_error = error_candidate - rounded
        q = xp.where(active, q, 0.0)
        error = xp.where(active, new_error, error)
        cols.append(q.astype(xp.int32))
    qlp = xp.stack(cols, axis=-1)
    return (qlp, shift_nonneg.astype(xp.int32))


def estimate_best_lpc_order(xp, errors, block_size, bits_per_sample,
                            qlp_precision, max_lpc_order):
    """batched log-domain order estimate (py_encoders/flac.py:676)

    errors: f64 [..., K]; bits_per_sample: int array broadcastable to
    the batch shape; returns int32 order per batch element.

    replicates the reference's loop: orders with error > 0 compete on
    estimated bits (strict <, earliest wins); the first order with
    error == 0.0 exactly wins immediately.
    """
    # spec constant defined at f32 precision so err * error_scale is
    # an exact product (26-bit * 24-bit operands)
    error_scale = float(np.float32(np.log(2) ** 2))
    K = max_lpc_order

    bps = xp.asarray(bits_per_sample)
    best_order = xp.zeros(errors.shape[:-1], dtype=xp.int32)
    best_bits = xp.full(errors.shape[:-1], 1e32, dtype=xp.float64)
    found_zero = xp.zeros(errors.shape[:-1], dtype=bool)

    for i in range(K):
        order = i + 1
        err = errors[..., i]
        header_bits = order * (bps + qlp_precision)
        # log output rounds to f32 precision immediately: collapses
        # sub-ulp libm/XLA/float-float differences; the constant
        # divide becomes a multiply by an f32-rounded reciprocal so
        # the product is exact (two f32-valued operands) — float-float
        # division is approximate and would reintroduce divergence
        log_err = f32round(xp, xp.log(
            xp.where(err > 0.0, err * error_scale, 1.0)))
        inv_2log2 = float(np.float32(1.0 / (np.log(2) * 2)))
        bits_per_residual = f32round(
            xp, xp.maximum(log_err * inv_2log2, 0.0))
        estimated = header_bits + bits_per_residual * (block_size -
                                                       order)

        improves = (err > 0.0) & (estimated < best_bits) & ~found_zero
        best_order = xp.where(improves, order, best_order)
        best_bits = xp.where(improves, estimated, best_bits)

        is_zero = (err == 0.0) & ~found_zero
        best_order = xp.where(is_zero, order, best_order)
        found_zero = found_zero | is_zero

    return best_order
