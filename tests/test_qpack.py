"""Quantized-analysis upload spec (ops/qpack.py) and its native packer.

Mirrors the reference's dual-implementation oracle pattern
(/root/reference/test/test_formats.py:4075-4130): the numpy spec is
the oracle; the C++ planner/packer (_native.flac_qpack) and the JAX
device unpack must agree with it exactly.  Losslessness invariants:
unpack(pack(x)) == (x >> t) << t for every backend, the sideband
carries *exact* OR/const values, and the end-to-end encode stays
bit-exact while oracle and fast paths stay byte-identical.
"""

import io
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from audiotools_tpu.ops import qpack  # noqa: E402
from audiotools_tpu import _native, pcm  # noqa: E402
from audiotools_tpu.pcmstream import PCMReader  # noqa: E402


def _signal(B, n, ch, bps, scale, seed=0):
    rng = np.random.default_rng(seed)
    lim = 1 << (bps - 1)
    x = rng.normal(0, scale, (B, n, ch))
    tones = np.sin(np.arange(n)[None, :, None] * 0.07) * scale * 4
    return np.clip(x + tones, -lim, lim - 1).astype(np.int32)


CASES = [
    (16, 9000.0, 2, True),     # program material, stereo trials
    (16, 30.0, 2, True),       # quiet (t should stay 0 or small)
    (16, 0.0, 2, True),        # silence
    (8, 40.0, 1, False),       # 8-bit mono (cap -> t == 0)
    (24, 2.0e6, 6, False),     # 24-bit multichannel
]


@pytest.mark.parametrize("bps,scale,ch,stereo", CASES)
def test_native_matches_numpy_spec(bps, scale, ch, stereo):
    n = 4096
    x = _signal(5, n, ch, bps, scale)
    x[1, :, 0] = x[1, 0, 0]                     # a constant channel
    t_np = qpack.plan_t(x, bps)
    (orv_np, cf_np) = qpack.variant_sideband(x, stereo)
    (pk_np, k_np, x0_np) = qpack.pack(x, t_np)
    (pk_c, k_c, t_c, x0_c, orv_c, cf_c) = _native.flac_qpack(
        x, bps, qpack.guard_bits(), stereo)
    assert np.array_equal(t_np, t_c)
    assert k_np == k_c
    assert np.array_equal(x0_np, x0_c)
    assert np.array_equal(orv_np, orv_c)
    assert np.array_equal(cf_np, cf_c)
    assert np.array_equal(pk_np, pk_c)


@pytest.mark.parametrize("bps,scale,ch,stereo", CASES)
def test_unpack_reconstructs_quantized(bps, scale, ch, stereo):
    n = 4096
    x = _signal(4, n, ch, bps, scale, seed=3)
    (pk, k, t, x0, _orv, _cf) = _native.flac_qpack(
        x, bps, qpack.guard_bits(), stereo)
    rec = qpack.unpack(np, pk, k, t, x0, n)
    assert np.array_equal(rec, qpack.quantize(np, x, t))


def test_jax_unpack_matches_numpy():
    import jax
    import jax.numpy as jnp
    x = _signal(4, 4096, 2, 16, 9000.0, seed=5)
    (pk, k, t, x0, _orv, _cf) = _native.flac_qpack(x, 16, 3, True)
    rec_j = np.asarray(jax.jit(
        lambda p, t, x0: qpack.unpack(jnp, p, k, t, x0, 4096))(
            pk, t, x0))
    assert np.array_equal(rec_j, qpack.unpack(np, pk, k, t, x0, 4096))


def test_sideband_is_exact():
    """OR/const sideband must reflect the exact samples, not the
    quantized view (the two lossless-critical decisions)"""
    x = _signal(3, 4096, 2, 16, 9000.0, seed=7)
    x[0, :, 0] = (x[0, :, 0] >> 2) << 2         # genuine wasted bits
    x[2, :, 1] = -12345                          # constant channel
    (orv, cf) = qpack.variant_sideband(x, True)
    left = x[:, :, 0]
    right = x[:, :, 1]
    assert orv[0, 0] == np.bitwise_or.reduce(left[0])
    assert (orv[0, 0] & 3) == 0
    assert bool(cf[2, 1])
    assert not bool(cf[0, 0])
    side = left - right
    assert orv[1, 3] == np.bitwise_or.reduce(side[1])


def test_quiet_signals_stay_exact():
    """t == 0 (no quantization) whenever the residual scale is small"""
    x = _signal(3, 4096, 2, 16, 0.5, seed=9)
    t = qpack.plan_t(x, 16)
    assert int(t.max()) == 0
    # analysis keeps >= cap_margin significant bits; noise-dominated
    # blocks may release the cap by 2 (noise-adaptive coarsening)
    x8 = _signal(3, 4096, 1, 8, 40.0)
    assert int(qpack.plan_t(x8, 8).max()) <= max(
        8 - max(qpack.cap_margin() - 2, 0), 0)
    # with the adaptive coarsening off the strict margin holds
    assert int(qpack.plan_t(x8, 8, extra=0).max()) <= max(
        8 - qpack.cap_margin(), 0)
    # ... and the legacy conservative margin pins loud 8-bit audio
    # at t == 0
    assert int(qpack.plan_t(x8, 8, margin=8, extra=0).max()) == 0


def test_encode_roundtrip_with_qpack():
    """production encode stays bit-exact and backend-identical"""
    from audiotools_tpu.codecs.flac_enc_fast import encode_flac_fast
    from audiotools_tpu.codecs.flac_dec_fast import FastFlacDecoder

    rng = np.random.default_rng(11)
    n = 4096 * 6 + 777
    tone = 9000 * np.sin(np.arange(n) * 0.06)
    arr = np.clip(
        np.stack([tone, -tone], axis=1) + rng.normal(0, 600, (n, 2)),
        -32768, 32767).astype(np.int32)

    def reader():
        fl = pcm.FrameList._wrap(arr, 16)
        return PCMReader(io.BytesIO(fl.to_bytes(False, True)),
                         44100, 2, 3, 16)

    opts = dict(block_size=4096, max_lpc_order=8, mid_side=True,
                exhaustive_model_search=False,
                max_residual_partition_order=5, batch_frames=3)
    b1 = io.BytesIO()
    encode_flac_fast(b1, reader(), backend="numpy", **opts)
    data = b1.getvalue()
    dec = FastFlacDecoder(io.BytesIO(data))
    out = []
    while True:
        fl = dec.read(4096)
        if fl.frames == 0:
            break
        out.append(fl.samples)
    assert np.array_equal(np.concatenate(out), arr)

    b2 = io.BytesIO()
    encode_flac_fast(b2, reader(), backend="jax", **opts)
    assert b2.getvalue() == data


# ---------------------------------------------------------------------------
# patched-base wire (pack_patched / flac_qpack_patched): narrow base
# width + sparse full-width exceptions; transport-only, so every
# reconstruction must equal quantize() exactly


@pytest.mark.parametrize("bps,scale,ch,stereo", CASES[:3])
def test_patched_native_matches_numpy(bps, scale, ch, stereo):
    n = 4096
    x = _signal(5, n, ch, bps, scale, seed=9)
    t = qpack.plan_t(x, bps)
    (pk_c, k_full, t_c, x0_c, _orv, _cf, epos_c, eval_c, mexc_c,
     kb) = _native.flac_qpack_patched(
        x, bps, qpack.guard_bits(), stereo, None, 8)
    assert np.array_equal(t, t_c)
    (pk_np, epos_np, eval_np, mexc_np) = qpack.pack_patched(
        x, t, kb, 8)
    assert mexc_c == mexc_np
    if mexc_c <= 8:
        assert np.array_equal(pk_c, pk_np)
        assert np.array_equal(epos_c, epos_np)
        assert np.array_equal(eval_c, eval_np)


def test_patched_unpack_reconstructs_exactly():
    n = 4096
    x = _signal(6, n, 2, 16, 9000.0, seed=13)
    t = qpack.plan_t(x, 16)
    (pk, k_full, t2, x0, _o, _c, epos, evals, mexc,
     kb) = _native.flac_qpack_patched(x, 16, 0, True, None, 32)
    assert mexc <= 32 and kb < k_full
    want = qpack.quantize(np, x, t)
    rec = qpack.unpack(np, pk, kb, t, x0, n, epos, evals)
    assert np.array_equal(rec, want)
    import jax
    import jax.numpy as jnp
    rec_j = np.asarray(jax.jit(
        lambda p, t, x0, ep, ev: qpack.unpack(
            jnp, p, kb, t, x0, n, ep, ev))(pk, t, x0, epos, evals))
    assert np.array_equal(rec_j, want)


def test_patched_overflow_reports_truncation():
    """a base far below the content's width must report max_exc > E
    (the caller's retry signal), never silently corrupt"""
    x = _signal(2, 4096, 2, 16, 14000.0, seed=17)
    (_pk, k_full, _t, _x0, _o, _c, _ep, _ev, mexc,
     kb) = _native.flac_qpack_patched(x, 16, 0, True, 2, 8)
    if kb < k_full:              # content quantized fine at 2 bits?
        # with base 2 on noisy content, exceptions overflow E=8
        assert mexc > 8


def test_patched_encode_backend_identity():
    """end-to-end: the patched wire is transport-only, so numpy and
    jax encodes stay byte-identical and bit-exact"""
    from audiotools_tpu.codecs.flac_enc_fast import encode_flac_fast
    from audiotools_tpu.codecs.flac_dec_fast import FastFlacDecoder

    rng = np.random.default_rng(23)
    n = 4096 * 5 + 123
    tone = 8000 * np.sin(np.arange(n) * 0.055)
    arr = np.clip(
        np.stack([tone, tone * 0.7], axis=1) +
        rng.normal(0, 500, (n, 2)), -32768, 32767).astype(np.int32)

    def reader():
        fl = pcm.FrameList._wrap(arr, 16)
        return PCMReader(io.BytesIO(fl.to_bytes(False, True)),
                         44100, 2, 3, 16)

    opts = dict(block_size=4096, max_lpc_order=8, mid_side=True,
                exhaustive_model_search=False,
                max_residual_partition_order=5, batch_frames=3)
    b1 = io.BytesIO()
    encode_flac_fast(b1, reader(), backend="numpy", **opts)
    data = b1.getvalue()
    dec = FastFlacDecoder(io.BytesIO(data))
    out = []
    while True:
        fl = dec.read(4096)
        if fl.frames == 0:
            break
        out.append(fl.samples)
    assert np.array_equal(np.concatenate(out), arr)
    b2 = io.BytesIO()
    encode_flac_fast(b2, reader(), backend="jax", **opts)
    assert b2.getvalue() == data


def test_noise_adaptive_plan():
    """noise-dominated blocks coarsen by noise_extra and release the
    cap by 2; tonal blocks keep the exact-guard t (spec: plan_t)"""
    rng = np.random.default_rng(31)
    n = 4096
    t_ax = np.arange(n)
    noise = rng.integers(-800, 800, (1, n, 1)).astype(np.int32)
    tone = (9000 * np.sin(2 * np.pi * 441 * t_ax / 44100)
            )[None, :, None].astype(np.int32)
    t_noise = int(qpack.plan_t(noise, 16, extra=2)[0, 0])
    t_noise_off = int(qpack.plan_t(noise, 16, extra=0)[0, 0])
    assert t_noise == t_noise_off + 2
    t_tone = int(qpack.plan_t(tone, 16, extra=2)[0, 0])
    t_tone_off = int(qpack.plan_t(tone, 16, extra=0)[0, 0])
    assert t_tone == t_tone_off          # tonal: untouched
    # the C++ planner agrees exactly on both, with and without the
    # adaptive extra (via flac_qpack's t)
    for arr in (noise, tone):
        for extra in (0, 2):
            arr2 = np.concatenate([arr, arr], axis=2)  # stereo
            (_q, _k, t_c, _x0, _orv, _cf) = _native.flac_qpack(
                arr2, 16, 0, True, noise_extra=extra)
            t_py = qpack.plan_t(arr2, 16, extra=extra)
            assert np.array_equal(t_c, t_py)
    # constant / near-linear blocks stay exact
    const = np.full((1, n, 1), 1234, dtype=np.int32)
    assert int(qpack.plan_t(const, 16)[0, 0]) == 0
    ramp = (t_ax[None, :, None] * 3).astype(np.int32)
    assert int(qpack.plan_t(ramp, 16)[0, 0]) == 0


def test_emit_exact_rice_research():
    """the emit-stage exact entropy re-search (C++ emit_rice_research
    via flac_emit_frames2) matches the scalar spec
    (ref/flac_enc.emit_rice_search) and never enlarges output"""
    from audiotools_tpu.codecs.flac_enc_fast import encode_flac_fast
    from audiotools_tpu.ref.flac_enc import (
        encode_flac as oracle_encode, emit_rice_search)
    from audiotools_tpu.ref.flac_analysis import (
        valid_partition_orders, _rice_search)

    # spec-level: on exact residuals the emit search finds a total
    # no worse than the analysis search's choice
    rng = np.random.default_rng(7)
    n = 1024
    res = rng.integers(-5000, 5000, n).astype(np.int64)
    res[:3] = 0
    porders = valid_partition_orders(n, 6, 12)
    (po_e, params_e) = emit_rice_search(res, 3, n, porders, 14)
    assert po_e in porders
    assert all(0 <= p <= 14 for p in params_e)
    (po_a, params_a, bits_a) = _rice_search(res, 3, n, porders, 14)

    def exact_bits(porder, params):
        u = np.where(res >= 0, res << 1,
                     ((-res - 1) << 1) | 1).astype(np.int64)
        parts = 1 << porder
        psize = n >> porder
        useg = u.reshape(parts, psize)
        counts = np.full(parts, psize, dtype=np.int64)
        counts[0] = psize - 3
        total = 0
        for p in range(parts):
            r = params[p]
            total += 4 + int((useg[p] >> r).sum()) + \
                int(counts[p]) * (1 + r)
        if max(params) > 14:
            total += parts
        return total

    assert exact_bits(po_e, params_e) <= exact_bits(po_a, params_a)

    # end-to-end: re-search output decodes losslessly, matches the
    # oracle byte-for-byte, and is never larger than no-re-search
    arr = np.clip(np.stack(
        [3000 * np.sin(np.arange(4096 * 3) * 0.02),
         3000 * np.sin(np.arange(4096 * 3) * 0.031)], axis=1) +
        rng.normal(0, 900, (4096 * 3, 2)), -32768, 32767).astype(
            np.int32)

    def reader():
        fl = pcm.FrameList._wrap(arr, 16)
        return PCMReader(io.BytesIO(fl.to_bytes(False, True)),
                         44100, 2, 3, 16)

    opts = dict(block_size=4096, max_lpc_order=8, mid_side=True,
                exhaustive_model_search=False,
                max_residual_partition_order=5, batch_frames=3)
    sizes = {}
    for flag in ("1", "0"):
        os.environ["ATPU_EMIT_EXACT_RICE"] = flag
        try:
            b1 = io.BytesIO()
            b2 = io.BytesIO()
            oracle_encode(b1, reader(), padding_bytes=None,
                          block_size=4096, max_lpc_order=8,
                          mid_side=True,
                          max_residual_partition_order=5)
            encode_flac_fast(b2, reader(), padding_size=None,
                             backend="numpy", **opts)
            assert b1.getvalue() == b2.getvalue()
            sizes[flag] = len(b2.getvalue())
        finally:
            os.environ.pop("ATPU_EMIT_EXACT_RICE", None)
    assert sizes["1"] <= sizes["0"]
