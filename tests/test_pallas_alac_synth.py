"""The Pallas ALAC synthesis kernel must produce the same samples as
the lax.scan form (held byte-identical to the host decoder by the
ALAC batteries).  Interpret mode, small shapes — production uses the
kernel on real TPUs only."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from audiotools_tpu.ops import alac_synth  # noqa: E402


@pytest.mark.parametrize("seed,S,n,order_hi", [
    (1, 8, 64, 4),
    (2, 16, 128, 8),
])
def test_pallas_matches_scan(seed, S, n, order_hi):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    residuals = rng.integers(-500, 500, (S, n)).astype(np.int32)
    order = rng.integers(1, order_hi + 1, S).astype(np.int32)
    qlp = np.zeros((S, alac_synth.K), dtype=np.int32)
    for s in range(S):
        qlp[s, :order[s]] = rng.integers(-2000, 2000, order[s])
    shift = rng.integers(6, 13, S).astype(np.int32)
    sample_size = np.full(S, 16, dtype=np.int32)

    assert alac_synth.pallas_synthesis_safe(
        qlp, shift, sample_size, order)

    ref = alac_synth.synthesize(
        np, residuals, qlp, order, shift, sample_size, n,
        max_order=8)
    got = np.asarray(alac_synth._synthesize_pallas(
        jnp.asarray(residuals), jnp.asarray(qlp),
        jnp.asarray(order), jnp.asarray(shift),
        jnp.asarray(sample_size), n, 8))
    assert np.array_equal(ref, got)


def test_pallas_diff_chain_rows():
    """order >= 31 rows (pure difference chain) and raw-ish order-0
    rows through the kernel"""
    import jax.numpy as jnp

    rng = np.random.default_rng(9)
    S, n = 8, 64
    residuals = rng.integers(-300, 300, (S, n)).astype(np.int32)
    order = np.array([31, 31, 1, 2, 3, 4, 5, 6], dtype=np.int32)
    qlp = np.zeros((S, alac_synth.K), dtype=np.int32)
    for s in range(2, S):
        qlp[s, :order[s]] = rng.integers(-1500, 1500, order[s])
    shift = np.full(S, 9, dtype=np.int32)
    sample_size = np.full(S, 16, dtype=np.int32)

    ref = alac_synth.synthesize(
        np, residuals, qlp, order, shift, sample_size, n,
        max_order=8)
    got = np.asarray(alac_synth._synthesize_pallas(
        jnp.asarray(residuals), jnp.asarray(qlp),
        jnp.asarray(order), jnp.asarray(shift),
        jnp.asarray(sample_size), n, 8))
    assert np.array_equal(ref, got)


def test_tta_inverse_pallas_matches_scan():
    """the TTA inverse-filter Pallas kernel vs the lax.scan form
    (interpret mode, small shapes)"""
    import jax.numpy as jnp

    from audiotools_tpu.ops import tta_synth

    rng = np.random.default_rng(4)
    for bps in (8, 16, 24):
        res = rng.integers(-400, 400, (8, 64)).astype(np.int32)
        ref = tta_synth.inverse_filter_predict(np, res, bps)
        got = np.asarray(tta_synth._inverse_pallas(
            jnp.asarray(res), bps))
        assert np.array_equal(ref, got), bps
