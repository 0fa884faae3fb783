"""WavPack device-backend tests.

``ATPU_WV_BACKEND=jax`` routes the encoder's correlation passes
through ops/wv_scan.py (sign-adaptive weight scans fused into one
device program per block).  The output must stay byte-identical to
the oracle/native path — same differential-oracle pattern as the
FLAC/ALAC/TTA backends (reference test model:
test_formats.py:6134 test_python_codec).
"""

import io

import numpy as np
import pytest

from audiotools_tpu import pcm
from audiotools_tpu.pcmstream import PCMReader
from audiotools_tpu.codecs import wavpack_jax
from audiotools_tpu.ref.wavpack import encode_wavpack, WavPackDecoder


def make_reader(arr, sr=44100, bps=16):
    arr = np.asarray(arr, dtype=np.int32)
    if arr.ndim == 1:
        arr = arr.reshape(-1, 1)
    fl = pcm.FrameList._wrap(arr, bps)
    mask = {1: 4, 2: 3, 6: 0x3F}.get(arr.shape[1], 0)
    return PCMReader(io.BytesIO(fl.to_bytes(False, True)),
                     sr, arr.shape[1], mask, bps)


def signal(n, ch=2, seed=7):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    tone = np.stack([(7000 * np.sin(t * 0.013 * (c + 1)))
                     for c in range(ch)], axis=1)
    return (tone + rng.integers(-300, 300, (n, ch))).astype(np.int32)


def encode_bytes(arr, passes, block_size=4096):
    buf = io.BytesIO()
    encode_wavpack(buf, make_reader(arr), block_size=block_size,
                   correlation_passes=passes)
    return buf.getvalue()


# each (passes, shape) signature compiles one XLA program on this
# 1-core box; default run keeps the two cheapest chains
@pytest.mark.parametrize("passes,ch,n", [
    (1, 2, 9000), (2, 1, 9000),
    pytest.param(5, 2, 9000, marks=pytest.mark.slow),
    pytest.param(16, 2, 9000, marks=pytest.mark.slow),
    pytest.param(5, 6, 5000, marks=pytest.mark.slow),
    # short final block exercises the per-shape jit signatures
    pytest.param(5, 2, 4096 + 700, marks=pytest.mark.slow)])
def test_wv_jax_backend_byte_identity(monkeypatch, passes, ch, n):
    arr = signal(n, ch)
    wavpack_jax.install()
    monkeypatch.setenv("ATPU_WV_BACKEND", "native")
    native = encode_bytes(arr, passes)
    monkeypatch.setenv("ATPU_WV_BACKEND", "jax")
    jax_out = encode_bytes(arr, passes)
    assert native == jax_out
    # and the stream still decodes exactly
    assert np.array_equal(_decode(jax_out), arr)


def _decode(data):
    dec = WavPackDecoder(io.BytesIO(data))
    out = []
    f = dec.read(1 << 17)
    while len(f) > 0:
        out.append(f.samples)
        f = dec.read(1 << 17)
    return np.concatenate(out, axis=0)


@pytest.mark.parametrize("term", [18, 17, 8, 3, 1, -1, -2, -3])
def test_wv_scan_numpy_vs_jax(term):
    """pass kernels are backend-deterministic (exact int64)"""
    jnp = pytest.importorskip("jax.numpy")
    import jax
    jax.config.update("jax_enable_x64", True)
    from audiotools_tpu.ops import wv_scan

    rng = np.random.default_rng(3)
    cc = 2
    n = 500
    x = rng.integers(-(1 << 20), 1 << 20, (cc, n)).astype(np.int64)
    w = rng.integers(-900, 900, (1, cc)).astype(np.int64)
    span = 2 if term in (17, 18) else (term if term > 0 else 1)
    s = rng.integers(-(1 << 15), 1 << 15, (cc, span)).astype(np.int64)
    chain = ((term, 2),)

    a = wv_scan.run_pass_chain(np, x, chain, w, (s,))
    b = wv_scan.run_pass_chain(jnp, jnp.asarray(x), chain,
                               jnp.asarray(w), (jnp.asarray(s),))
    assert np.array_equal(np.asarray(a[0]), np.asarray(b[0]))
    assert np.array_equal(np.asarray(a[1]), np.asarray(b[1]))
    for (sa, sb) in zip(a[2], b[2]):
        assert np.array_equal(np.asarray(sa), np.asarray(sb))
