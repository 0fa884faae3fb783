"""Device (JAX) WavPack decorrelation backend.

``ATPU_WV_BACKEND=jax`` routes the WavPack encoder's correlation
passes through ``ops/wv_scan.py``: a block's whole pass chain (up to
16 sign-adaptive weight scans) runs as ONE jitted device program;
the byte-serial tail (entropy coder, sub-block framing, CRC) and the
format's block-to-block quantized state chain stay on host —
the same analysis/emit split as the FLAC/ALAC/TTA backends.

Byte-identical to the oracle (``ref/wavpack.py``) and the native
kernels across the roundtrip matrix (tests/test_wavpack.py).
Pathological tiny blocks (shorter than a pass's warm-up span) return
None, falling back to the oracle path for that block.
"""

from __future__ import annotations

import os

import numpy as np

_jit_cache = {}


def enabled():
    return os.environ.get("ATPU_WV_BACKEND", "native") == "jax"


def dec_enabled():
    return os.environ.get("ATPU_WV_DEC_BACKEND", "native") == "jax"


def install():
    """points ref/wavpack's override hooks at the device backends
    (each hook checks its ``enabled()`` per call, so installing is
    unconditional and the env vars stay live)"""
    from ..ref import wavpack as ref_wv
    ref_wv.correlate_channels_override = _correlate_jax
    ref_wv.decorrelate_channels_override = _decorrelate_jax


def _get_jit(chain, cc, n, sample_shapes):
    key = (chain, cc, n, sample_shapes)
    if key in _jit_cache:
        return _jit_cache[key]
    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from ..ops import wv_scan

    def run(x, weights, samples):
        return wv_scan.run_pass_chain(jnp, x, chain, weights, samples)

    fn = jax.jit(run)
    _jit_cache[key] = fn
    return fn


def _correlate_jax(uncorrelated, params, channel_count):
    """the correlate_channels override; returns None to fall back"""
    if not enabled():
        return None
    cc = channel_count
    x = np.stack([np.asarray(c, dtype=np.int64)
                  for c in uncorrelated[:cc]], axis=0)
    n = x.shape[1]
    chain = tuple((p.term, p.delta) for p in params)
    if not chain:
        return None
    # warm-up spans must fit inside the block
    max_span = max((t if 1 <= t <= 8 else 2) for (t, _d) in chain)
    if n < max_span:
        return None

    weights = np.zeros((len(params), cc), dtype=np.int64)
    samples = []
    for (p_i, p) in enumerate(params):
        weights[p_i, :] = [int(w) for w in p.weights[:cc]]
        span = len(p.samples[0])
        s = np.zeros((cc, span), dtype=np.int64)
        for c in range(cc):
            s[c, :] = [int(v) for v in p.samples[c]]
        samples.append(s)
    samples = tuple(samples)

    fn = _get_jit(chain, cc, n, tuple(s.shape for s in samples))
    (latest, w_out, s_out) = fn(x, weights, samples)
    latest = np.asarray(latest)
    w_out = np.asarray(w_out)

    for (p_i, p) in enumerate(params):
        p.update_weights([int(v) for v in w_out[p_i][:cc]])
        p.update_samples([[int(v) for v in np.asarray(s_out[p_i])[c]]
                          for c in range(cc)])
    return [latest[c] for c in range(cc)]


def _get_dec_jit(chain, cc, n, sample_shapes):
    key = ("dec", chain, cc, n, sample_shapes)
    if key in _jit_cache:
        return _jit_cache[key]
    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from ..ops import wv_scan

    def run(x, weights, samples):
        return wv_scan.run_dec_chain(jnp, x, chain, weights, samples)

    fn = jax.jit(run)
    _jit_cache[key] = fn
    return fn


def _decorrelate_jax(residuals, terms, deltas, weights,
                     samples_list):
    """the _decorrelate_channels override (DECODE direction: one
    fused device program inverting a block's whole pass chain);
    returns None to fall back to the host path"""
    if not dec_enabled():
        return None
    cc = len(residuals)
    if cc not in (1, 2):
        return None
    x = np.stack([np.asarray(c, dtype=np.int64)
                  for c in residuals[:cc]], axis=0)
    n = x.shape[1]
    chain = tuple(zip(terms, deltas))
    if not chain or n == 0:
        return None
    for (term, _delta) in chain:
        # the oracle raises 'unsupported term' for anything outside
        # this set — fall back so the error surface stays identical
        # (and negative terms are 2-channel-only)
        if not (1 <= term <= 8 or term in (17, 18) or
                (-3 <= term <= -1 and cc == 2)):
            return None

    w = np.zeros((len(chain), cc), dtype=np.int64)
    samples = []
    for (p_i, (term, _delta)) in enumerate(chain):
        w[p_i, :] = [int(v) for v in weights[p_i][:cc]]
        span = len(samples_list[p_i][0]) if samples_list[p_i] else 0
        want = (2 if term in (17, 18)
                else term if 1 <= term <= 8 else 1)
        if span < want:
            return None         # degenerate warm-up: host path
        s = np.zeros((cc, span), dtype=np.int64)
        for c in range(min(cc, len(samples_list[p_i]))):
            s[c, :] = [int(v) for v in samples_list[p_i][c]]
        samples.append(s)
    samples = tuple(samples)

    fn = _get_dec_jit(chain, cc, n, tuple(s.shape for s in samples))
    out = np.asarray(fn(x, w, samples))
    return [out[c] for c in range(cc)]
