"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Real-TPU benchmarking happens only in bench.py; unit tests exercise the
same jitted code paths on host CPU with 8 virtual devices so that
multi-chip sharding logic is tested without TPU hardware.
"""

import os

# force CPU: the harness presets JAX_PLATFORMS=axon (tunneled TPU),
# but unit tests are CPU-by-design — on the tunnel they'd pay remote
# compiles (45-400 s each, hangs in bad weather).  ATPU_TEST_PLATFORM
# explicitly opts a run onto another platform.
os.environ["JAX_PLATFORMS"] = os.environ.get(
    "ATPU_TEST_PLATFORM", "cpu")
# installed pytest plugins (e.g. jaxtyping's) can import jax BEFORE
# this conftest runs, freezing the jax_platforms config flag to the
# harness's preset (axon) — the env assignment above is then ignored
# and every jit in the suite silently dispatches to the tunneled TPU.
# If jax is already in, update the live config too (backends have not
# initialized yet at conftest time, so the update still takes).
import sys

if "jax" in sys.modules:
    sys.modules["jax"].config.update(
        "jax_platforms", os.environ["JAX_PLATFORMS"])
# the axon PJRT plugin (tunneled TPU) routes XLA compiles through a
# remote compile service even for the CPU backend; when the tunnel is
# congested a trivial jit can hang for minutes.  Unit tests are
# CPU-only by design, so drop the plugin from the import path and make
# the suite immune to tunnel weather (bench.py/real-TPU runs never
# import this conftest).
import re

# the plugin ships as a path entry whose basename starts with ".axon"
# (e.g. /root/.axon_site); match that component exactly rather than a
# bare substring so unrelated paths merely containing "axon" survive
_AXON_ENTRY = re.compile(r"^\.?axon([_.-]|$)")


def _is_axon_path(p):
    return bool(_AXON_ENTRY.match(os.path.basename(p.rstrip(os.sep))))


if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    os.environ["PYTHONPATH"] = os.pathsep.join(
        p for p in os.environ.get("PYTHONPATH", "").split(os.pathsep)
        if p and not _is_axon_path(p))
# unit tests default to the numpy analysis backend (byte-identical to
# jax by the contraction-immune kernel spec) so the suite isn't
# dominated by one-off jit compiles; jax-path tests opt in explicitly
os.environ.setdefault("ATPU_FLAC_BACKEND", "numpy")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import sys
if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    # PYTHONPATH was already consumed into sys.path at startup; drop
    # the plugin's entry there too (before anything imports jax)
    sys.path[:] = [p for p in sys.path if not _is_axon_path(p)]
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_DIR = "/root/reference"


def reference_available():
    return os.path.isdir(os.path.join(REFERENCE_DIR, "test"))
