"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Sharding / multi-chip logic is validated on host devices
(xla_force_host_platform_device_count); the real TPU is exercised by bench.py.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# Default the codec drivers to the NumPy path in tests: each distinct block
# shape would otherwise trigger a fresh XLA compile (slow on the CPU test
# runner).  Dedicated device tests opt back in explicitly.
os.environ.setdefault("XSI_DEVICE", "numpy")

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
