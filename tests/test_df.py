"""Unit battery for the deterministic double-f32 arithmetic layer.

Validates ops/df.py against exact rational arithmetic
(fractions.Fraction), checks the f32-valuedness invariant every
primitive promises (both halves of every pair must be exact f32
values — the property the cross-backend determinism proof rests on),
and byte-compares numpy against jitted CPU XLA over random and
adversarial (huge exponent gap, cancellation) inputs.
"""

from fractions import Fraction

import numpy as np
import pytest

from audiotools_tpu.ops import df


def _f32_valued(x):
    return np.all(x.astype(np.float32).astype(np.float64) == x)


def _rand_f32(rng, n, scale_bits=0):
    m = rng.integers(-(1 << 24) + 1, 1 << 24, size=n)
    e = rng.integers(-scale_bits, scale_bits + 1, size=n) if scale_bits \
        else np.zeros(n, dtype=np.int64)
    return (m.astype(np.float64) * np.exp2(e.astype(np.float64) - 20.0))


def _rand_df(rng, n, scale_bits=0):
    hi = _rand_f32(rng, n, scale_bits)
    lo = _rand_f32(rng, n, scale_bits) * np.exp2(-25.0)
    # renormalize so |lo| <= ulp(hi)/2 via the library's own two-sum
    return df.fast_two_sum(np, hi, lo)


def _frac(pair):
    return [Fraction(float(h)) + Fraction(float(l))
            for (h, l) in zip(np.atleast_1d(pair[0]),
                              np.atleast_1d(pair[1]))]


def test_fast_two_sum_exact_and_f32_valued():
    rng = np.random.default_rng(1234)
    a = _rand_f32(rng, 512, scale_bits=40)
    b = _rand_f32(rng, 512, scale_bits=40)
    (s, e) = df.fast_two_sum(np, a, b)
    assert _f32_valued(s) and _f32_valued(e)
    for i in range(512):
        assert (Fraction(float(s[i])) + Fraction(float(e[i]))
                == Fraction(float(a[i])) + Fraction(float(b[i])))


def test_fast_two_sum_extreme_gap():
    # gaps far beyond f64's 53-bit span: the naive unordered error
    # term breaks here; the ordered form must stay exact
    a = np.array([1.5e30, -1e-30, 1.0, 3.0], dtype=np.float64)
    a = a.astype(np.float32).astype(np.float64)
    b = np.array([1e-30, 1.5e30, -1.0 + 2.0 ** -23, -3.0],
                 dtype=np.float64)
    b = b.astype(np.float32).astype(np.float64)
    (s, e) = df.fast_two_sum(np, a, b)
    assert _f32_valued(s) and _f32_valued(e)
    for i in range(4):
        assert (Fraction(float(s[i])) + Fraction(float(e[i]))
                == Fraction(float(a[i])) + Fraction(float(b[i])))


def test_add_mul_accuracy():
    rng = np.random.default_rng(99)
    a = _rand_df(rng, 256, scale_bits=8)
    b = _rand_df(rng, 256, scale_bits=8)
    s = df.add(np, a, b)
    p = df.mul(np, a, b)
    assert all(_f32_valued(x) for x in (*s, *p))
    (af, bf) = (_frac(a), _frac(b))
    for i in range(256):
        exact = af[i] + bf[i]
        got = Fraction(float(s[0][i])) + Fraction(float(s[1][i]))
        if exact != 0:
            assert abs((got - exact) / exact) < Fraction(1, 2 ** 43)
        exact = af[i] * bf[i]
        got = Fraction(float(p[0][i])) + Fraction(float(p[1][i]))
        if exact != 0:
            assert abs((got - exact) / exact) < Fraction(1, 2 ** 43)


def test_div_accuracy():
    rng = np.random.default_rng(7)
    a = _rand_df(rng, 256, scale_bits=8)
    b = _rand_df(rng, 256, scale_bits=8)
    b = (np.where(b[0] == 0.0, 1.0, b[0]), b[1])
    q = df.div(np, a, b)
    (af, bf) = (_frac(a), _frac(b))
    for i in range(256):
        if bf[i] == 0:
            continue
        exact = af[i] / bf[i]
        got = Fraction(float(q[0][i])) + Fraction(float(q[1][i]))
        if exact != 0:
            assert abs((got - exact) / exact) < Fraction(1, 2 ** 42)


def test_div_zero_denominator():
    a = df.split(np, np.array([3.0, -1.0]))
    b = df.split(np, np.array([0.0, 2.0]))
    q = df.div(np, a, b)
    assert q[0][0] == 0.0 and q[1][0] == 0.0
    assert q[0][1] == -0.5


def test_split_from_parts_to_f32():
    rng = np.random.default_rng(42)
    # exact integers below 2^46
    v = rng.integers(-(1 << 46), 1 << 46, size=128).astype(np.float64)
    pair = df.split(np, v)
    assert _f32_valued(pair[0]) and _f32_valued(pair[1])
    for i in range(128):
        assert (Fraction(float(pair[0][i])) + Fraction(float(pair[1][i]))
                == Fraction(float(v[i])))
    parts = [rng.integers(-(1 << 40), 1 << 40,
                          size=64).astype(np.float64) for _ in range(3)]
    acc = df.from_parts(np, *parts)
    total = parts[0] + parts[1] + parts[2]
    err = np.abs((acc[0] + acc[1]) - total)
    assert np.all(err <= np.abs(total) * 2.0 ** -43 + 1.0)
    f32v = df.to_f32(np, acc)
    assert _f32_valued(f32v)


@pytest.mark.parametrize("op", ["add", "sub", "mul", "div", "add1",
                                "mul1", "fast_two_sum", "split"])
def test_numpy_vs_jax_bit_identical(op):
    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    rng = np.random.default_rng(
        np.frombuffer(op.encode().ljust(8, b"_")[:8],
                      dtype=np.uint64)[0] % (1 << 30))
    a = _rand_df(rng, 128, scale_bits=30)
    b = _rand_df(rng, 128, scale_bits=30)
    b = (np.where(b[0] == 0.0, 1.0, b[0]), b[1])
    scal = _rand_f32(rng, 128, scale_bits=30)
    if op in ("add", "sub", "mul", "div"):
        fn = getattr(df, op)
        ref = fn(np, a, b)
        jit = jax.jit(lambda ah, al, bh, bl: fn(
            jnp, (ah, al), (bh, bl)))
        got = jit(*a, *b)
    elif op in ("add1", "mul1"):
        fn = getattr(df, op)
        ref = fn(np, a, scal)
        jit = jax.jit(lambda ah, al, s: fn(jnp, (ah, al), s))
        got = jit(*a, scal)
    elif op == "fast_two_sum":
        ref = df.fast_two_sum(np, a[0], b[0])
        jit = jax.jit(lambda x, y: df.fast_two_sum(jnp, x, y))
        got = jit(a[0], b[0])
    else:
        exact = rng.integers(-(1 << 46), 1 << 46,
                             size=128).astype(np.float64)
        ref = df.split(np, exact)
        jit = jax.jit(lambda x: df.split(jnp, x))
        got = jit(exact)
    for (r, g) in zip(ref, got):
        assert np.array_equal(np.asarray(r),
                              np.asarray(g)), op
