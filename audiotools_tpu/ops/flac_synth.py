"""Batched FLAC subframe synthesis + stereo reconstruction.

The decode-side counterpart of ops/flac_frames.py: predictor inversion
for a batch of subframes as ONE fused scan over sample positions —
the TPU-native form of reference ``src/decoders/flac.c:888-896``
(subframe synthesis) and ``:1213`` (decorrelation).  Each block's
recurrence is seeded from the bitstream's stored warm-up samples, so
blocks are exactly independent (SURVEY.md §7 hard part 3) and the
whole batch advances together: each scan step computes one sample for
all S subframes as a [S, 32] multiply-accumulate.

Exactness: the prediction sum is <= 32 products of |q| < 2^14 and
|s| < 2^26 — every f64 product is exact (< 2^40) and the 32-term sum
stays below 2^45, exactly representable even under the TPU's
float-float f64 emulation (< 2^47), in any order.  The arithmetic
shift is an exact power-of-two scale + floor.  FIXED subframes run
through the same scan with the fixed coefficient rows
([1], [2,-1], [3,-3,1], [4,-6,4,-1]) and shift 0; CONSTANT and
VERBATIM rows pass through (order 0, zero coefficients).

Backend-generic (``xp`` = numpy oracle or jax.numpy device path),
bit-identical on both.
"""

from __future__ import annotations

import numpy as np

from . import lpc as lpc_ops

K = 32   # static coefficient width (FLAC order <= 32)

FIXED_COEFFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def fill_fixed_qlp(sub_meta, qlp):
    """host-side (numpy): writes the FIXED-predictor coefficient rows
    into the qlp array for subframes of type 2 (sub_meta layout from
    _native.flac_scan); returns qlp (modified copy)"""
    qlp = np.array(qlp, dtype=np.int32, copy=True)
    for order, coeffs in FIXED_COEFFS.items():
        rows = np.nonzero((sub_meta[:, 1] == 2) &
                          (sub_meta[:, 2] == order))[0]
        if len(rows):
            qlp[rows] = 0
            for j, c in enumerate(coeffs):
                qlp[rows, j] = c
    return qlp


def synthesize(xp, residuals, warmup, qlp, shift, order, n):
    """inverts the predictors for a batch of subframes

    residuals: int32 [S, n] (CONSTANT rows zero, VERBATIM rows carry
               the raw samples; positions < order are ignored)
    warmup:    int32 [S, Kw] stored warm-up samples (Kw <= K static;
               callers may slice to the batch's max order — the
               per-step multiply-accumulate width is the scan's
               dominant arithmetic, and -8 streams use order <= 12)
    qlp:       int32 [S, Kw] predictor coefficients (FIXED rows carry
               the fixed-difference coefficients, see fill_fixed_qlp)
    shift:     int32 [S] quantization shift (0 for FIXED)
    order:     int32 [S] predictor order (0 = pass-through)
    n:         static block length

    returns samples int32 [S, n]
    """
    S = residuals.shape[0]
    qf = qlp.astype(xp.float64)                        # [S, Kw]
    scale = lpc_ops.exact_exp2(xp, -shift.astype(xp.int64))  # [S]
    ordv = order.astype(xp.int32)

    Kw = qlp.shape[1]
    # warm-up plane: column i (< order) holds the stored sample
    warm_full = xp.zeros((S, n), dtype=xp.int32)
    kk = min(Kw, n)
    if xp is np:
        warm_full[:, :kk] = warmup[:, :kk]
    else:
        warm_full = warm_full.at[:, :kk].set(warmup[:, :kk])

    if xp is np:
        hist = np.zeros((S, Kw), dtype=np.float64)
        out = np.empty((S, n), dtype=np.int32)
        res_f = residuals.astype(np.float64)
        idx = np.arange(S)
        for i in range(n):
            pred = np.floor(np.sum(qf * hist, axis=1) * scale)
            val = np.where(i < ordv,
                           warm_full[:, i].astype(np.float64),
                           res_f[:, i] + pred)
            v32 = val.astype(np.int64).astype(np.int32)
            out[:, i] = v32
            hist[:, 1:] = hist[:, :-1]
            hist[:, 0] = v32
        return out

    import jax
    import jax.numpy as jnp

    def one(hist, res_i, warm_i, i):
        pred = jnp.floor(jnp.sum(qf * hist, axis=1) * scale)
        val = jnp.where(i < ordv,
                        warm_i.astype(jnp.float64),
                        res_i.astype(jnp.float64) + pred)
        v32 = val.astype(jnp.int64).astype(jnp.int32)
        hist = jnp.concatenate(
            [v32[:, None].astype(jnp.float64), hist[:, :-1]], axis=1)
        return (hist, v32)

    # U samples per scan step: the recurrence advances sequentially
    # INSIDE the step body (identical arithmetic order), so the scan
    # pays n/U step boundaries instead of n — scan-step overhead was
    # the measured wall of the device decode path
    import os as _os
    U = int(_os.environ.get("ATPU_SYNTH_UNROLL", "16"))
    while n % U:
        U //= 2

    def step(hist, xs):
        (res_u, warm_u, i_u) = xs          # [U, S], [U, S], [U]
        outs = []
        for u in range(U):
            (hist, v32) = one(hist, res_u[u], warm_u[u], i_u[u])
            outs.append(v32)
        return (hist, jnp.stack(outs))

    hist0 = jnp.zeros((S, Kw), dtype=jnp.float64)
    xs = (residuals.T.reshape(n // U, U, S),
          warm_full.T.reshape(n // U, U, S),
          jnp.arange(n, dtype=jnp.int32).reshape(n // U, U))
    (_, ys) = jax.lax.scan(step, hist0, xs)
    return ys.reshape(n, S).T                           # [S, n]


def reconstruct_frames(xp, samples, wasted, frame_assignment, ch):
    """wasted-bits restore + stereo decorrelation + interleave

    samples: int32 [F * ch, n] synthesized subframe planes (frame f's
             channels at rows f*ch..f*ch+ch)
    wasted:  int32 [F * ch]
    frame_assignment: int32 [F] FLAC channel assignment (0-7
             independent, 8 left-side, 9 side-right, 10 mid-side)
    ch: static channel count

    returns int32 [F, n, ch] interleaved PCM
    """
    n = samples.shape[1]
    shifted = samples << wasted[:, None]
    F = frame_assignment.shape[0]
    planes = xp.reshape(shifted, (F, ch, n))
    if ch == 2:
        a = frame_assignment[:, None]
        c0 = planes[:, 0]
        c1 = planes[:, 1]
        # mid-side exact reconstruction (reference flac.c:1213)
        msum = (c0 << 1) | (c1 & 1)
        left = xp.where(a == 9, c0 + c1,
                        xp.where(a == 10, (msum + c1) >> 1, c0))
        right = xp.where(a == 8, c0 - c1,
                         xp.where(a == 10, (msum - c1) >> 1, c1))
        planes = xp.stack([left, right], axis=1)
    return xp.swapaxes(planes, 1, 2)                    # [F, n, ch]
