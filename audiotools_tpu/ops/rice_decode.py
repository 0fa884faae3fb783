"""Batched Rice decoding — a vectorized bit-level state machine.

The TPU-native re-expression of the reference decoder's bit-serial
Rice loop (``/root/reference/src/decoders/flac.c:1156-1193``): instead
of walking the bitstream one code at a time, each residual *partition*
(whose bit span and parameters the host scan recorded —
``_native.atpu_flac_scan``) is decoded as data-parallel array work
over u32 lanes:

1. the partition's bit window is expanded to a 0/1 bit matrix,
2. an exclusive prefix count + scatter builds ``ones_pos`` (position
   of the j-th set bit) so "next set bit at-or-after position p" is a
   single gather — the unary-quotient terminator lookup,
3. the per-position successor function ``next(p)`` (start of the code
   after one starting at ``p``) is composed by POINTER DOUBLING:
   log2(C) batched gathers yield the start positions of all C codes
   in a partition simultaneously — the sequential state machine
   becomes a parallel function composition,
4. quotient + low bits extract with two-word fetches and shifts, and
   zigzag decoding is branchless integer algebra.

Raw runs (escape partitions and VERBATIM subframes) use the same
machinery with a constant stride, skipping the terminator lookup.

Backend-generic: ``xp`` is numpy (host oracle / tests) or jax.numpy
inside jit (device path).  Both produce identical int32 residuals.
"""

from __future__ import annotations

import numpy as np


def _take1(xp, arr, idx):
    """take_along_axis over the last axis"""
    return xp.take_along_axis(arr, idx, axis=1)


def _bitcast_i32(xp, u):
    """reinterpret uint32 as int32 (no value conversion)"""
    if xp is np:
        return np.ascontiguousarray(u, dtype=np.uint32).view(np.int32)
    import jax.lax
    return jax.lax.bitcast_convert_type(
        u.astype(xp.uint32), xp.int32)


def _clz32(xp, v):
    """count leading zeros of uint32 (0 -> 32): bit smear + popcount"""
    y = v | (v >> xp.uint32(1))
    y = y | (y >> xp.uint32(2))
    y = y | (y >> xp.uint32(4))
    y = y | (y >> xp.uint32(8))
    y = y | (y >> xp.uint32(16))
    if xp is np:
        pc = np.bitwise_count(y.astype(np.uint32)).astype(np.int32)
    else:
        import jax.lax
        pc = jax.lax.population_count(y).astype(xp.int32)
    return 32 - pc


def _next_one_table(xp, bits, N):
    """next_one[p] = position of the first set bit at-or-after p
    (sentinel N-1 past the last set bit)

    a REVERSE RUNNING MINIMUM of masked positions — pure cumulative
    scans (log-depth shifts+mins on TPU), replacing the round-3
    cumsum + scatter + take construction whose general scatters were
    a measured decode cost"""
    pos = xp.arange(N, dtype=xp.int32)[None, :]
    masked = xp.where(bits == 1, pos, N - 1)
    if xp is np:
        return np.minimum.accumulate(
            masked[:, ::-1], axis=1)[:, ::-1].astype(np.int32)
    import jax.lax
    return jax.lax.cummin(masked, axis=1, reverse=True)


def decode_partitions(xp, words, word_base, base_bits, k, raw_bits,
                      count, W, C):
    """decodes a bucket of residual partitions from a shared bit buffer

    words:     [Wtot] uint32 — the frame bytes as big-endian 32-bit
               words (stream bit b lives at bit ``31 - b % 32`` of
               word ``b // 32``)
    word_base: [P] int32 — first word of each partition's window
    base_bits: [P] int32 — bit offset of the first code within the
               window (0..31)
    k:         [P] int32 — Rice parameter, or -1 for raw runs
    raw_bits:  [P] int32 — fixed code width for raw runs (escape
               partitions / VERBATIM), or -1 for Rice
    count:     [P] int32 — number of codes in the partition (<= C)
    W, C:      static bucket sizes: window words and max code count
               (the window must hold base_bits + the partition's bit
               length within W*32 bits)

    returns [P, C] int32 residuals (zigzag undone; raw runs
    sign-extended); positions >= count are 0
    """
    P = word_base.shape[0]
    N = W * 32
    Wtot = words.shape[0]

    # ---- window gather (one spare word for straddling reads) ----
    widx = word_base[:, None] + xp.arange(W + 1, dtype=xp.int32)[None, :]
    widx = xp.clip(widx, 0, Wtot - 1)
    win = words[widx]                                   # [P, W+1] u32

    is_raw = raw_bits >= 0
    kc = xp.maximum(k, 0).astype(xp.int32)
    rc = xp.maximum(raw_bits, 0).astype(xp.int32)

    pos = xp.arange(N, dtype=xp.int32)
    wi = (pos >> 5).astype(xp.int32)
    bi = (31 - (pos & 31)).astype(xp.uint32)
    bits = ((win[:, : W][:, wi] >> bi) & xp.uint32(1)).astype(
        xp.int32)                                       # [P, N]

    # ---- next-set-bit table ----
    next_one = _next_one_table(xp, bits, N)             # [P, N]

    # ---- successor function + pointer doubling ----
    nxt = xp.where(is_raw[:, None],
                   pos[None, :] + rc[:, None],
                   next_one + 1 + kc[:, None])
    A = xp.minimum(nxt, N - 1).astype(xp.int32)
    starts = base_bits[:, None].astype(xp.int32)        # [P, 1]
    m = 1
    while m < C:
        step = _take1(xp, A, xp.minimum(starts, N - 1))
        starts = xp.concatenate([starts, step], axis=1)
        m *= 2
        if m < C:
            A = _take1(xp, A, A)
    starts = starts[:, :C]

    # ---- code extraction ----
    st = xp.minimum(starts, N - 1)
    qpos = _take1(xp, next_one, st)                     # [P, C]
    q = (qpos - st).astype(xp.uint32)
    off = xp.where(is_raw[:, None], st, qpos + 1)
    nbits = xp.where(is_raw[:, None], rc[:, None],
                     kc[:, None]).astype(xp.int32)      # [P, C]

    wi2 = xp.minimum(off >> 5, W - 1).astype(xp.int32)
    w0 = _take1(xp, win, wi2)
    w1 = _take1(xp, win, wi2 + 1)
    sh = (off & 31).astype(xp.uint32)
    sh_safe = xp.maximum(sh, xp.uint32(1))
    hi = xp.where(sh == 0, w0,
                  (w0 << sh) | (w1 >> (xp.uint32(32) - sh_safe)))
    nb_safe = xp.clip(nbits, 1, 32).astype(xp.uint32)
    lsb = xp.where(nbits <= 0, xp.uint32(0),
                   hi >> (xp.uint32(32) - nb_safe))     # [P, C] u32

    # Rice: u = (q << k) | lsb, zigzag-undone
    u = ((q << kc[:, None].astype(xp.uint32)) | lsb).astype(xp.uint32)
    res_rice = _bitcast_i32(xp, (u >> xp.uint32(1)) ^
                            (xp.uint32(0) - (u & xp.uint32(1))))
    # raw: sign-extend nbits-wide value
    sbit = xp.where(nbits > 0,
                    xp.uint32(1) << (nb_safe - xp.uint32(1)),
                    xp.uint32(0))
    res_raw = _bitcast_i32(xp, (lsb ^ sbit) - sbit)

    res = xp.where(is_raw[:, None], res_raw, res_rice)
    valid = xp.arange(C, dtype=xp.int32)[None, :] < count[:, None]
    return xp.where(valid, res, 0).astype(xp.int32)


def decode_partitions_scan(xp, words, word_base, base_bits, k,
                           raw_bits, count, W, C):
    """decode_partitions for LARGE buckets: a lock-step scan over
    code indices

    Same contract as ``decode_partitions``.  Pointer doubling costs
    O(P * N * log C) general gathers, which for whole-subframe
    partitions (porder 0 at -8: N = 65536, C = 4096) measured ~14 s
    per 256-frame batch — general-gather throughput is the TPU's
    weakest op.  This path instead advances ALL P partitions one code
    per step (``lax.scan``): every step is a handful of [P]-wide
    row gathers.  All tables are WORD-level ([P, W] not [P, 32*W]):
    the next-set-bit lookup is a CLZ of the shifted current word with
    a next-nonzero-word table as the long-quotient fallback, so the
    memory footprint permits thousands of partition lanes per batch —
    the lever that amortizes the TPU's fixed per-op cost on narrow
    scan states.

    Backend-generic; the numpy path runs the identical algorithm
    step-by-step (oracle/tests)."""
    P = word_base.shape[0]
    N = W * 32
    Wtot = words.shape[0]

    widx = (word_base[:, None] +
            xp.arange(W + 1, dtype=xp.int32)[None, :])
    widx = xp.clip(widx, 0, Wtot - 1)
    win = words[widx]                                   # [P, W+1] u32

    is_raw = raw_bits >= 0
    kc = xp.maximum(k, 0).astype(xp.int32)
    rc = xp.maximum(raw_bits, 0).astype(xp.int32)

    # next-nonzero-word table: nzw[w] = smallest w' >= w with
    # win[w'] != 0, sentinel W (reverse running minimum — pure scans)
    widx_w = xp.arange(W, dtype=xp.int32)[None, :]
    masked_w = xp.where(win[:, :W] != xp.uint32(0), widx_w, W)
    if xp is np:
        nzw = np.minimum.accumulate(
            masked_w[:, ::-1], axis=1)[:, ::-1].astype(np.int32)
    else:
        import jax.lax
        nzw = jax.lax.cummin(masked_w.astype(xp.int32), axis=1,
                             reverse=True)

    ku = kc.astype(xp.uint32)

    def step(cur):
        """decodes one code at position `cur` for every partition;
        returns (residual [P] int32, next position [P] int32)"""
        st = xp.minimum(cur, N - 1)
        wi = (st >> 5).astype(xp.int32)
        bi = (st & 31).astype(xp.uint32)
        w_cur = _take1(xp, win, wi[:, None])[:, 0]
        rem = (w_cur << bi).astype(xp.uint32)
        # next set bit at-or-after st: within the current word via
        # CLZ, else the first set bit of the next nonzero word
        # (wi + 1 >= W falls off the window: sentinel W directly —
        # clamping into nzw would resurrect bits BEFORE st)
        wnext = xp.where(
            wi + 1 >= W, W,
            _take1(xp, nzw,
                   xp.minimum(wi + 1, W - 1)[:, None])[:, 0])
        w_far = _take1(xp, win,
                       xp.minimum(wnext, W)[:, None])[:, 0]
        t_in = st + _clz32(xp, rem)
        t_far = xp.where(wnext >= W, N - 1,
                         (wnext << 5) + _clz32(xp, w_far))
        qpos = xp.where(rem != 0, t_in,
                        t_far).astype(xp.int32)
        qpos = xp.minimum(qpos, N - 1)
        q = (qpos - st).astype(xp.uint32)
        off = xp.where(is_raw, st, qpos + 1)
        nbits = xp.where(is_raw, rc, kc)
        wi2 = xp.minimum(off >> 5, W - 1).astype(xp.int32)
        w0 = _take1(xp, win, wi2[:, None])[:, 0]
        w1 = _take1(xp, win, wi2[:, None] + 1)[:, 0]
        sh = (off & 31).astype(xp.uint32)
        sh_safe = xp.maximum(sh, xp.uint32(1))
        hi = xp.where(sh == 0, w0,
                      (w0 << sh) | (w1 >> (xp.uint32(32) - sh_safe)))
        nb_safe = xp.clip(nbits, 1, 32).astype(xp.uint32)
        lsb = xp.where(nbits <= 0, xp.uint32(0),
                       hi >> (xp.uint32(32) - nb_safe))
        u = ((q << ku) | lsb).astype(xp.uint32)
        res_rice = _bitcast_i32(xp, (u >> xp.uint32(1)) ^
                                (xp.uint32(0) - (u & xp.uint32(1))))
        sbit = xp.where(nbits > 0,
                        xp.uint32(1) << (nb_safe - xp.uint32(1)),
                        xp.uint32(0))
        res_raw = _bitcast_i32(xp, (lsb ^ sbit) - sbit)
        res = xp.where(is_raw, res_raw, res_rice)
        nxt = xp.where(is_raw, st + rc, qpos + 1 + kc)
        return (res.astype(xp.int32),
                xp.minimum(nxt, N - 1).astype(xp.int32))

    start = base_bits.astype(xp.int32)
    if xp is np:
        out = np.zeros((P, C), dtype=np.int32)
        cur = start
        for j in range(C):
            (res, cur) = step(cur)
            out[:, j] = res
    else:
        import jax.lax

        # U codes per scan step (identical arithmetic; C/U step
        # boundaries instead of C — step overhead is the wall)
        U = SCAN_UNROLL
        while C % U:
            U //= 2

        def body(cur, _):
            outs = []
            for _u in range(U):
                (res, cur) = step(cur)
                outs.append(res)
            return (cur, xp.stack(outs))

        (_cur, seq) = jax.lax.scan(body, start, None, length=C // U)
        out = seq.reshape(C, P).T                       # [P, C]

    valid = xp.arange(C, dtype=xp.int32)[None, :] < count[:, None]
    return xp.where(valid, out, 0).astype(xp.int32)


def _pallas_rice_enabled():
    """whether the Pallas kernel backs small-C chunk buckets
    (ATPU_RICE_PALLAS=0 restores the lax.scan form)"""
    import os
    return os.environ.get("ATPU_RICE_PALLAS", "1") != "0"


# partition lanes per Pallas grid cell (vector lane width)
_PL_LANES = 128


def decode_partitions_pallas(words, word_base, base_bits, k,
                             raw_bits, count, W, C):
    """``decode_partitions_scan`` as ONE Pallas TPU kernel per bucket

    The lax.scan form issues ~30 XLA ops per decoded code on
    [P]-wide vectors — on the tunneled backend that per-op dispatch
    is the decode program's wall (total op count, not step count,
    bound it: unrolling the scan was flat).  Here the whole C-step
    walk runs inside one kernel: windows and next-nonzero-word
    tables live in VMEM with partitions on the LANE axis and window
    words on sublanes (dynamic per-lane word reads become one-hot
    multiply-reduces over the sublane axis — TPUs have no per-lane
    gather), CLZ is bit-smear + SWAR popcount in pure int32, and the
    bit-position state stays in registers across the unrolled code
    loop.  Same integers as the scan form by construction.

    int32 everywhere (the x64-era pallas rules, see
    ops/pallas_bitpack.py); logical shifts via
    ``jax.lax.shift_right_logical`` on int32 bit patterns."""
    import sys

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # Mosaic's lowering walks the kernel jaxpr recursively; the
    # unrolled code loop's chain depth exceeds CPython's default
    # 1000-frame limit (deep but finite — the interpret path and the
    # sibling synthesis kernel lower fine)
    if sys.getrecursionlimit() < 100000:
        sys.setrecursionlimit(100000)

    def srl(v, amt):
        amt_arr = jnp.broadcast_to(jnp.asarray(amt, jnp.int32),
                                   jnp.shape(v))
        return jax.lax.shift_right_logical(v, amt_arr)

    P = word_base.shape[0]
    N = W * 32
    Wtot = words.shape[0]
    P2 = -(-P // _PL_LANES) * _PL_LANES
    # sublane tiling: window rows pad to a multiple of 8
    Wp = -(-(W + 1) // 8) * 8

    def pad_lanes(a):
        pad = P2 - a.shape[0]
        return jnp.pad(a, [(0, pad)]) if pad else a

    wb = pad_lanes(word_base.astype(jnp.int32))
    bb = pad_lanes(base_bits.astype(jnp.int32))
    kv = pad_lanes(k.astype(jnp.int32))
    rv = pad_lanes(raw_bits.astype(jnp.int32))

    # window + next-nonzero-word tables (XLA prep: one gather + one
    # reverse cummin — cheap next to the per-code work)
    widx = wb[:, None] + jnp.arange(W + 1, dtype=jnp.int32)[None, :]
    widx = jnp.clip(widx, 0, Wtot - 1)
    win = jax.lax.bitcast_convert_type(
        words.astype(jnp.uint32), jnp.int32)[widx]      # [P2, W+1]
    pos_w = jnp.arange(W, dtype=jnp.int32)[None, :]
    masked_w = jnp.where(win[:, :W] != 0, pos_w, W)
    nzw = jax.lax.cummin(masked_w, axis=1, reverse=True)

    # sublane-major layout [Wp, P2]
    win_t = jnp.pad(win.T, [(0, Wp - (W + 1)), (0, 0)])
    nzw_t = jnp.pad(nzw.T, [(0, Wp - W), (0, 0)])

    # codes per sequential grid step: a fully unrolled C-code body
    # exceeded Mosaic's lowering recursion depth, so the code axis
    # rides the (sequential-on-TPU) second grid dimension with the
    # bit cursor carried in VMEM scratch — the established pattern
    # (ops/pallas_bitpack.py's token axis)
    Uc = 16
    while C % Uc:
        Uc //= 2

    def kernel(win_ref, nzw_ref, bb_ref, k_ref, r_ref, out_ref,
               cur_ref):
        t = pl.program_id(1)
        win_v = win_ref[:]                       # [Wp, L]
        nzw_v = nzw_ref[:]
        siota = jax.lax.broadcasted_iota(jnp.int32, (Wp, _PL_LANES),
                                         0)
        # ALL in-kernel scalars are explicit int32 constants created
        # INSIDE the kernel (pallas rejects captured outside-trace
        # constants, and under the global x64 flag a weak Python int
        # in the body trips jax 0.9.0's infinite trace recursion —
        # the pitfall ops/pallas_bitpack.py documents for index maps
        # applies to the kernel body too)
        I32 = jnp.int32
        c0 = I32(0)
        c1 = I32(1)
        c2 = I32(2)
        c4 = I32(4)
        c5 = I32(5)
        c8 = I32(8)
        c16 = I32(16)
        c24 = I32(24)
        c31 = I32(31)
        c32 = I32(32)
        cN1 = I32(N - 1)
        cW = I32(W)
        cW1 = I32(W - 1)
        m55 = I32(0x55555555)
        m33 = I32(0x33333333)
        m0F = I32(0x0F0F0F0F)
        m01 = I32(0x01010101)

        def popcount(v):
            v = v - (srl(v, c1) & m55)
            v = (v & m33) + (srl(v, c2) & m33)
            v = (v + srl(v, c4)) & m0F
            return srl(v * m01, c24)

        def clz32(v):
            y = v | srl(v, c1)
            y = y | srl(y, c2)
            y = y | srl(y, c4)
            y = y | srl(y, c8)
            y = y | srl(y, c16)
            return c32 - popcount(y)

        @pl.when(t == t - t)
        def _init():
            cur_ref[:] = bb_ref[:]

        def sel(tab, idx):
            """tab[idx[lane], lane] via one-hot reduce (no per-lane
            gather on TPU vector units)"""
            oh = (siota == idx).astype(jnp.int32)
            return jnp.sum(tab * oh, axis=0,
                           dtype=jnp.int32)[None, :]

        kc = jnp.maximum(k_ref[0, :], c0)[None, :]
        rc = jnp.maximum(r_ref[0, :], c0)[None, :]
        is_raw = (r_ref[0, :] >= c0)[None, :]
        nbits = jnp.where(is_raw, rc, kc)
        nb_safe = jnp.clip(nbits, c1, c32)
        sbit = jnp.where(nbits > c0,
                         jnp.left_shift(c1, nb_safe - c1), c0)
        cur = cur_ref[:]

        for u in range(Uc):
            st = jnp.minimum(cur, cN1)
            wi = srl(st, c5)
            bi = st & c31
            w_cur = sel(win_v, wi)
            rem = jnp.left_shift(w_cur, bi)
            wnext = jnp.where(wi + c1 >= cW, cW,
                              sel(nzw_v, jnp.minimum(wi + c1, cW1)))
            w_far = sel(win_v, jnp.minimum(wnext, cW))
            t_in = st + clz32(rem)
            t_far = jnp.where(wnext >= cW, cN1,
                              jnp.left_shift(wnext, c5) +
                              clz32(w_far))
            qpos = jnp.minimum(jnp.where(rem != c0, t_in, t_far),
                               cN1)
            q = qpos - st
            off = jnp.where(is_raw, st, qpos + c1)
            wi2 = jnp.minimum(srl(off, c5), cW1)
            w0 = sel(win_v, wi2)
            w1 = sel(win_v, wi2 + c1)
            sh = off & c31
            sh_safe = jnp.maximum(sh, c1)
            hi = jnp.where(sh == c0, w0,
                           jnp.left_shift(w0, sh) |
                           srl(w1, c32 - sh_safe))
            lsb = jnp.where(nbits <= c0, c0, srl(hi, c32 - nb_safe))
            u_val = jnp.left_shift(q, kc) | lsb
            res_rice = srl(u_val, c1) ^ (c0 - (u_val & c1))
            res_raw = (lsb ^ sbit) - sbit
            res = jnp.where(is_raw, res_raw, res_rice)
            out_ref[0, u, :] = res[0, :]
            nxt = jnp.where(is_raw, st + rc, qpos + c1 + kc)
            cur = jnp.minimum(nxt, cN1)
        cur_ref[:] = cur

    interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        kernel,
        grid=(P2 // _PL_LANES, C // Uc),
        in_specs=[
            pl.BlockSpec((Wp, _PL_LANES), lambda p, t: (t - t, p)),
            pl.BlockSpec((Wp, _PL_LANES), lambda p, t: (t - t, p)),
            pl.BlockSpec((1, _PL_LANES), lambda p, t: (t - t, p)),
            pl.BlockSpec((1, _PL_LANES), lambda p, t: (t - t, p)),
            pl.BlockSpec((1, _PL_LANES), lambda p, t: (t - t, p)),
        ],
        out_specs=pl.BlockSpec((1, Uc, _PL_LANES),
                               lambda p, t: (p, t, t - t)),
        out_shape=jax.ShapeDtypeStruct(
            (P2 // _PL_LANES, C, _PL_LANES), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((1, _PL_LANES), jnp.int32),
        ],
        interpret=interpret,
    )(win_t, nzw_t, bb[None, :], kv[None, :], rv[None, :])

    # [tiles, C, LANES] -> [P, C]
    vals = jnp.transpose(out, (0, 2, 1)).reshape(P2, C)[:P]
    valid = (jnp.arange(C, dtype=jnp.int32)[None, :] <
             count.astype(jnp.int32)[:, None])
    return jnp.where(valid, vals, 0).astype(jnp.int32)


# code-count threshold above which the lock-step scan path decodes a
# bucket (below it, pointer doubling's log C gathers win)
SCAN_MIN_CODES = 256
# pointer doubling issues P * 32W * ceil(log2 C) general gathers —
# the TPU's weakest op; above this budget the lock-step scan (whose
# cost is per-STEP, nearly lane-width-independent) wins even for
# short partitions.  Chunked decode batches put ~128k lanes in a
# (16..64, 64) bucket: pointer doubling there would issue ~400M
# gathers vs the scan's 16 wide steps.
PD_GATHER_BUDGET = int(
    __import__("os").environ.get("ATPU_RICE_PD_BUDGET", str(1 << 24)))
# codes per lock-step scan step (see decode_partitions_scan);
# 16 measured best on the chunked 64-code buckets (41.7 -> 46.8x
# on the 30 s decode protocol; deeper unrolls are flat — total op
# count, not step count, is the remaining wall)
SCAN_UNROLL = int(
    __import__("os").environ.get("ATPU_RICE_SCAN_U", "16"))


def decode_partitions_auto(xp, words, word_base, base_bits, k,
                           raw_bits, count, W, C):
    """dispatches a bucket to the Pallas kernel, pointer doubling or
    the lock-step scan (static shapes, so jit-safe)"""
    P = word_base.shape[0]
    if xp is not np and C <= 128 and W <= 256 and \
            _pallas_rice_enabled():
        # real-TPU only: Mosaic executes the kernel natively; the
        # CPU interpreter would evaluate its ~1500 unrolled ops per
        # bucket op-by-op (tests validate the kernel against the
        # scan form in interpret mode on SMALL shapes instead —
        # tests/test_pallas_rice.py)
        import jax
        if jax.default_backend() == "tpu":
            return decode_partitions_pallas(
                words, word_base, base_bits, k, raw_bits, count, W, C)
    logc = max(1, (C - 1).bit_length())
    if C >= SCAN_MIN_CODES or P * W * 32 * logc > PD_GATHER_BUDGET:
        return decode_partitions_scan(xp, words, word_base, base_bits,
                                      k, raw_bits, count, W, C)
    return decode_partitions(xp, words, word_base, base_bits, k,
                             raw_bits, count, W, C)


def scatter_residuals(xp, values, sub_idx, dest_off, count, S, n, C):
    """scatters bucket results [P, C] into subframe planes [S, n]

    values:  [P, C] int32 (zeros past count)
    sub_idx: [P] destination subframe row
    dest_off:[P] destination start position
    count:   [P] codes per partition
    """
    P = values.shape[0]
    cols = dest_off[:, None] + xp.arange(C, dtype=xp.int32)[None, :]
    if xp is np:
        out = np.zeros((S, n), dtype=np.int32)
        valid = np.arange(C, dtype=np.int32)[None, :] < count[:, None]
        rows = np.broadcast_to(sub_idx[:, None], (P, C))
        out[rows[valid], cols[valid]] = values[valid]
        return out
    # invalid positions scatter out of range and drop
    cols = xp.where(
        xp.arange(C, dtype=xp.int32)[None, :] < count[:, None],
        cols, n)
    rows = xp.broadcast_to(sub_idx[:, None], (P, C))
    out = xp.zeros((S, n), dtype=xp.int32)
    return out.at[rows, cols].set(values, mode="drop")


def bytes_to_words(data):
    """frame bytes -> big-endian uint32 words (host-side, numpy)"""
    buf = np.frombuffer(data, dtype=np.uint8)
    pad = (-len(buf)) % 4
    if pad:
        buf = np.concatenate([buf, np.zeros(pad, dtype=np.uint8)])
    return buf.view(">u4").astype(np.uint32)
