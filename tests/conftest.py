"""Test config: run everything on a virtual 8-device CPU mesh.

TPU hardware tests are exercised by the driver via bench.py and
__graft_entry__.py; unit tests must be hermetic and CPU-only.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
