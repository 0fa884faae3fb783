"""Two-process jax.distributed FARM workload (BASELINE config 5).

Beyond the init/analysis dryrun (test_multihost.py), this runs an
actual transcode workload across two OS processes standing in for two
hosts of a fleet: each process joins one 8-device global mesh via
``jax.distributed`` (4 virtual CPU devices each), runs the farm
(parallel/farm.transcode, device sharding on) over ITS shard of the
job list on its local devices, and the outputs must be byte-identical
to a single-process encode of the same tracks.  A final cross-host
``psum`` over the global mesh aggregates the fleet statistic (total
output bytes) — both processes must report the identical total, which
each also checks against its locally computed expectation.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(
    os.environ.get("ATPU_SKIP_MULTICHIP") == "1",
    reason="multichip tests disabled")


WORKER = r"""
import hashlib, io, os, sys
proc_id = int(sys.argv[1])
port = sys.argv[2]
workdir = sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["ATPU_FARM_DEVICE_SHARD"] = "1"

import numpy as np
from audiotools_tpu.parallel import mesh as mesh_mod

mesh_mod.init_distributed("127.0.0.1:" + port, 2, proc_id)

import jax
assert len(jax.devices()) == 8
local = jax.local_devices()
assert len(local) == 4

from audiotools_tpu import pcm
from audiotools_tpu.pcmstream import PCMReader
from audiotools_tpu.formats.wav import WaveAudio
from audiotools_tpu.formats.flac import FlacAudio
from audiotools_tpu.parallel import farm

SR = 44100
N_TRACKS = 4


def signal(seed, n):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    base = 7000.0 * np.sin(2 * np.pi * (300 + 40 * seed) * t / SR)
    arr = np.stack([base + rng.integers(-300, 300, n),
                    0.6 * base], axis=1)
    return np.clip(arr, -32768, 32767).astype(np.int32)


# every process materializes all source tracks (a shared filesystem
# in a real fleet); each encodes only its shard
sources = []
for i in range(N_TRACKS):
    path = os.path.join(workdir, "src%d_%d.wav" % (i, proc_id))
    arr = signal(i, SR // 2)
    fl = pcm.FrameList._wrap(arr, 16)
    WaveAudio.from_pcm(path, PCMReader(
        io.BytesIO(fl.to_bytes(False, True)), SR, 2, 3, 16))
    sources.append(path)

my_jobs = [farm.FarmJob(sources[i],
                        os.path.join(workdir,
                                     "out%d_%d.flac" % (i, proc_id)),
                        FlacAudio, compression="8")
           for i in range(N_TRACKS) if i % 2 == proc_id]
results = farm.transcode(my_jobs, workers=2, devices=local)
assert all(r.ok for r in results), [str(r.error) for r in results]

# byte-identity vs the in-process single-host reference encoder
my_bytes = 0
for r in results:
    with open(r.job.dest_path, "rb") as f:
        got = f.read()
    ref_path = r.job.dest_path + ".ref"
    src = r.job.source
    from audiotools_tpu import dispatch
    reader = dispatch.open(src).to_pcm()
    os.environ["ATPU_FLAC_BACKEND"] = "numpy"
    try:
        FlacAudio.from_pcm(ref_path, reader, compression="8")
    finally:
        del os.environ["ATPU_FLAC_BACKEND"]
        reader.close()
    with open(ref_path, "rb") as f:
        ref = f.read()
    assert got == ref, "distributed farm output diverges: %s" % (
        r.job.dest_path,)
    my_bytes += len(got)

# fleet statistic: cross-host psum over the global mesh
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from jax.experimental.multihost_utils import (
    host_local_array_to_global_array)

mesh = mesh_mod.make_mesh(8)
contrib = np.zeros(4, dtype=np.float64)
contrib[0] = float(my_bytes)
garr = host_local_array_to_global_array(contrib, mesh, P("blocks"))


def total(v):
    return jnp.sum(v)


fn = jax.jit(total, in_shardings=NamedSharding(mesh, P("blocks")),
             out_shardings=NamedSharding(mesh, P()))
fleet_total = float(fn(garr))
print("OK proc %d my_bytes %d fleet_total %.0f" %
      (proc_id, my_bytes, fleet_total), flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_farm_workload(tmp_path):
    port = str(_free_port())
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env.pop("JAX_PLATFORMS", None)

    workers = [subprocess.Popen(
        [sys.executable, "-c", WORKER, str(proc_id), port,
         str(tmp_path)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True, env=env, cwd=str(tmp_path))
        for proc_id in range(2)]
    outs = []
    for worker in workers:
        try:
            (out, err) = worker.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for w in workers:
                w.kill()
            raise
        outs.append((worker.returncode, out, err))
    totals = set()
    my_bytes = []
    for (proc_id, (rc, out, err)) in enumerate(outs):
        assert rc == 0, "proc %d failed:\n%s" % (proc_id, err[-3000:])
        line = [ln for ln in out.splitlines()
                if ln.startswith("OK proc %d" % proc_id)]
        assert line, out
        parts = line[0].split()
        my_bytes.append(int(parts[4]))
        totals.add(parts[6])
    # the cross-host reduction agreed on both hosts and equals the
    # sum of the per-host contributions
    assert len(totals) == 1
    assert float(totals.pop()) == float(sum(my_bytes))
