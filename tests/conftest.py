"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Sharding logic (cross-shard top-k merge, all-gather embed) is unit-tested on
CPU "devices" per SURVEY.md §4; real-TPU benchmarks run separately via
bench.py.

Note: the ambient environment registers a TPU backend at interpreter start
(sitecustomize imports jax), so env vars are already cached — use
jax.config.update, which works post-import.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
