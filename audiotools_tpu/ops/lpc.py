"""Batched LPC analysis primitives, deterministic across backends.

These functions define the framework's *numerical spec* for FLAC/ALAC
LPC analysis (window -> autocorrelation -> Levinson-Durbin ->
error-feedback quantization), re-deriving the reference algorithms
(``/root/reference/audiotools/py_encoders/flac.py:565-737``) as batched
array programs with bit-deterministic float64 semantics:

* summations use an explicit pairwise (binary-tree) reduction, so the
  result is identical regardless of batch shape or backend (NumPy vs
  XLA) — every f64 add/mul is IEEE correctly-rounded in both
* the coefficient-magnitude log2 used by quantization is computed
  exactly via frexp instead of libm log(), removing the one
  platform-dependent operation in the decision path
* rounding is IEEE round-half-even everywhere (np.round == jnp.round)

All functions take an ``xp`` module (numpy or jax.numpy) and operate on
arrays whose leading dimensions are batch dims.
"""

from __future__ import annotations

import numpy as np

_window_cache = {}


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


def levinson(xp, autocorr, max_order):
    """batched Levinson-Durbin recursion

    autocorr: f64 [..., max_order+1]
    returns (coeffs f64 [..., max_order, max_order], errors
    f64 [..., max_order]) where coeffs[..., o-1, :o] are the LP
    coefficients for order o.

    rows whose autocorrelation is degenerate (zero lag-0 or a zero
    intermediate error) produce ki = 0 continuations rather than the
    reference's div-by-zero crash; callers mask those rows separately.
    """
    batch = autocorr.shape[:-1]
    r0 = autocorr[..., 0]
    safe_r0 = xp.where(r0 == 0.0, 1.0, r0)
    k0 = autocorr[..., 1] / safe_r0
    k0 = xp.where(r0 == 0.0, 0.0, k0)

    # coeff rows built incrementally; store as list of per-order arrays
    coeff_rows = [xp.zeros(batch + (max_order,), dtype=xp.float64)]
    first = xp.zeros(batch + (max_order,), dtype=xp.float64)
    first = _set_col(xp, first, 0, k0)
    coeff_rows[0] = first
    errors = [autocorr[..., 0] * (1 - k0 * k0)]

    for i in range(1, max_order):
        prev = coeff_rows[i - 1]
        # acc = sum_j prev[j] * autocorr[i - j], sequential like the
        # reference's zip(reversed(...)) scalar loop
        acc = xp.zeros(batch, dtype=xp.float64)
        for j in range(i):
            acc = acc + prev[..., j] * autocorr[..., i - j]
        err_prev = errors[i - 1]
        safe_err = xp.where(err_prev == 0.0, 1.0, err_prev)
        ki = (autocorr[..., i + 1] - acc) / safe_err
        ki = xp.where(err_prev == 0.0, 0.0, ki)

        # new row: prev[j] - ki * prev[i-1-j] for j < i, then ki
        row = xp.zeros(batch + (max_order,), dtype=xp.float64)
        for j in range(i):
            row = _set_col(xp, row, j,
                           prev[..., j] - ki * prev[..., i - 1 - j])
        row = _set_col(xp, row, i, ki)
        coeff_rows.append(row)
        errors.append(err_prev * (1 - ki * ki))

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
    (exp2 of integral args and f64 compares are exact everywhere; no
    frexp/bitcast, which XLA's TPU x64 rewriter cannot lower)"""
    approx = xp.floor(xp.log2(values))
    # correct the floor estimate by at most one step each way
    approx = xp.where(xp.exp2(approx + 1.0) <= values, approx + 1.0,
                      approx)
    approx = xp.where(xp.exp2(approx) > values, approx - 1.0, approx)
    exact_power = xp.exp2(approx) == values
    # truncation toward zero: for v >= 1 trunc == floor; for v < 1
    # (log2 < 0) trunc == floor + 1 unless v is an exact power of two
    trunc = xp.where((values >= 1.0) | exact_power, approx, approx + 1.0)
    return trunc.astype(xp.int32)


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
    raw_shift = xp.minimum(
        (precision - 1) - (ilog2_trunc(xp, safe_l) - 1) - 1,
        (1 << 4) - 1)
    raw_shift = xp.where(has_l, raw_shift, 0)

    # effective multiplier: 2^shift for shift >= 0, else 1/2^-shift
    # with the emitted shift clamped to 0
    shift_nonneg = xp.maximum(raw_shift, 0)
    scale = xp.where(
        raw_shift >= 0,
        xp.exp2(raw_shift.astype(xp.float64)),
        1.0 / xp.exp2((-raw_shift).astype(xp.float64)))

    qlp_max = (1 << (precision - 1)) - 1
    qlp_min = -(1 << (precision - 1))

    error = xp.zeros(l.shape, dtype=xp.float64)
    cols = []
    for j in range(K):
        contribution = coeffs[..., j] * scale                # [..., K]
        active = valid[:, j]                                 # [K]
        error_candidate = error + contribution
        q = xp.clip(xp.round(error_candidate), qlp_min, qlp_max)
        new_error = error_candidate - q
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
    error_scale = np.log(2) ** 2
    K = max_lpc_order

    bps = xp.asarray(bits_per_sample)
    best_order = xp.zeros(errors.shape[:-1], dtype=xp.int32)
    best_bits = xp.full(errors.shape[:-1], 1e32, dtype=xp.float64)
    found_zero = xp.zeros(errors.shape[:-1], dtype=bool)

    for i in range(K):
        order = i + 1
        err = errors[..., i]
        header_bits = order * (bps + qlp_precision)
        log_err = xp.log(xp.where(err > 0.0, err * error_scale, 1.0))
        bits_per_residual = xp.maximum(log_err / (np.log(2) * 2), 0.0)
        estimated = header_bits + bits_per_residual * (block_size - order)

        improves = (err > 0.0) & (estimated < best_bits) & ~found_zero
        best_order = xp.where(improves, order, best_order)
        best_bits = xp.where(improves, estimated, best_bits)

        is_zero = (err == 0.0) & ~found_zero
        best_order = xp.where(is_zero, order, best_order)
        found_zero = found_zero | is_zero

    return best_order
