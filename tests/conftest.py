"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Real-TPU benchmarking happens only in bench.py; unit tests exercise the
same jitted code paths on host CPU with 8 virtual devices so that
multi-chip sharding logic is tested without TPU hardware.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# unit tests default to the numpy analysis backend (byte-identical to
# jax by the contraction-immune kernel spec) so the suite isn't
# dominated by one-off jit compiles; jax-path tests opt in explicitly
os.environ.setdefault("ATPU_FLAC_BACKEND", "numpy")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_DIR = "/root/reference"


def reference_available():
    return os.path.isdir(os.path.join(REFERENCE_DIR, "test"))
