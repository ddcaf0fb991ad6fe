"""Test config: run everything on a virtual 8-device CPU mesh.

Multi-device sharding tests need jax to see 8 devices without real chips
(SURVEY.md §4 point (4)); env vars must be set before jax is first imported.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
