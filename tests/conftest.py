"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Sharding logic (cross-shard top-k merge, all-gather embed) is unit-tested on
CPU "devices" per SURVEY.md §4; real-TPU benchmarks run separately via
bench.py.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
