"""Test configuration: CPU backend with 8 virtual devices (for sharding
tests) and float64 enabled (for bit-close parity with the float64 reference
renderer). TPU-targeted code paths are dtype-generic; correctness is
validated here in f64, performance on real TPU via bench.py."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# the axon TPU plugin force-sets jax_platforms at sitecustomize time;
# override it after import for CPU-hosted tests
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

REFERENCE = pathlib.Path("/root/reference")
GOLDEN = pathlib.Path(__file__).resolve().parent.parent / ".baseline" / "golden"
