"""Multi-device mesh tests on a virtual 8-device CPU backend.

The production encode path sharded over a Mesh must produce decisions
(and therefore files) bit-identical to the host NumPy backend — the
contraction-immune numeric spec makes this exact, and these tests
compare FULL decision arrays and whole files, not summaries."""

import io
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(
    os.environ.get("ATPU_SKIP_MULTICHIP") == "1",
    reason="multichip tests disabled")


def _run_in_virtual_mesh(code):
    """runs python code under an 8-device virtual CPU backend"""
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    result = subprocess.run([sys.executable, "-c", code],
                            capture_output=True, text=True,
                            env=env, timeout=900)
    assert result.returncode == 0, result.stderr[-2000:]
    return result.stdout


def test_sharded_decisions_equal_host():
    """sharded_packed_encode_step output == host NumPy, element-wise"""
    out = _run_in_virtual_mesh("""
import numpy as np
from audiotools_tpu.ops import flac_frames, lpc as lpc_ops
from audiotools_tpu.parallel import mesh as mesh_mod

n, K = 512, 6
porders = flac_frames.valid_partition_orders(n, 3, max(K, 4))
rng = np.random.default_rng(11)
t = np.arange(32 * n)
base = 8000.0 * np.sin(t * 0.013)
blocks = np.clip(np.stack([base + rng.integers(-200, 200, 32 * n),
                           0.7 * base], axis=1),
                 -32768, 32767).astype(np.int32).reshape(32, n, 2)
window = lpc_ops.tukey_window_df(n)

mesh = mesh_mod.make_mesh(8)
step = mesh_mod.sharded_packed_encode_step(
    mesh, n, K, 12, porders, 14, True, bps=16, mid_side=True)
(packed, total_bits) = step(blocks, window)
host = np.asarray(flac_frames.analyze_frames_packed(
    np, blocks, True, 16, n, K, 12, porders, 14, True, True, window))
assert np.array_equal(np.asarray(packed), host), "decisions diverge"
print("OK", float(total_bits))
""")
    assert out.startswith("OK")


def test_sharded_encode_file_equals_host():
    """a full encode with ATPU_DEVICES=8 equals the NumPy backend"""
    out = _run_in_virtual_mesh("""
import io, os
import numpy as np
from audiotools_tpu import pcm
from audiotools_tpu.pcmstream import PCMReader
from audiotools_tpu.codecs.flac_enc_fast import encode_flac_fast

SR = 44100
n = 4096 * 10 + 555         # non-multiple of devices after batching
rng = np.random.default_rng(5)
t = np.arange(n)
arr = np.clip(np.stack([9000 * np.sin(2 * np.pi * 441 * t / SR) +
                        rng.normal(0, 300, n),
                        8000 * np.sin(2 * np.pi * 600 * t / SR)],
                       axis=1), -32768, 32767).astype(np.int32)

def reader():
    fl = pcm.FrameList._wrap(arr, 16)
    return PCMReader(io.BytesIO(fl.to_bytes(False, True)),
                     SR, 2, 3, 16)

opts = dict(block_size=4096, max_lpc_order=8, mid_side=True,
            exhaustive_model_search=True,
            max_residual_partition_order=4, batch_frames=5)
b1 = io.BytesIO()
encode_flac_fast(b1, reader(), padding_size=None, backend="numpy",
                 **opts)
os.environ["ATPU_DEVICES"] = "8"
b2 = io.BytesIO()
encode_flac_fast(b2, reader(), padding_size=None, backend="jax",
                 **opts)
assert b1.getvalue() == b2.getvalue(), "sharded file diverges"
print("OK", len(b1.getvalue()))
""")
    assert out.startswith("OK")
