"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Sharding logic (cross-shard top-k merge, all-gather embed) is unit-tested on
CPU "devices" per SURVEY.md §4; real-TPU benchmarks run separately via
bench.py.

Note: the ambient environment registers a TPU backend at interpreter start
(sitecustomize imports jax), so env vars are already cached — use
jax.config.update, which works post-import.
"""

import jax
import pytest

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Modules whose every test is long-running by nature (full-size model parity
# twins, fuzz sweeps, multi-process DCN). They are auto-marked ``slow`` here
# so the fast tier (`make test`, ``-m "not slow"``) stays cheap; each has a
# small-shape sibling in the fast tier. Individual outlier tests elsewhere
# carry an explicit ``@pytest.mark.slow``.
_SLOW_MODULES = {
    "test_fullsize_lm_parity",   # full-size GPT-2 / Llama-3.2-1B / Gemma2-2B twins
    "test_fullsize_parity",      # full CLIP/SigLIP2/MobileCLIP towers vs torch twins
    "test_multihost",            # spawns 2 jax.distributed processes over DCN
    "test_round3_fuzz",          # property/fuzz sweeps (LRP conservation, crop boxes)
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.nodeid.rsplit("/", 1)[-1].split(".py")[0]
        if mod in _SLOW_MODULES:
            item.add_marker(pytest.mark.slow)
