"""
Test configuration.

Tests run on the CPU backend with 8 virtual devices so that multi-chip
sharding code paths (mesh partitioning, halo exchange, sharded regrid
apply) execute without TPU hardware.  Must run before jax is imported.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import matplotlib

matplotlib.use("Agg")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
