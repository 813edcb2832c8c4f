"""Compiled-program caches are true LRU (ADVICE round 4: they were FIFO —
cache hits never refreshed recency, so a hot program inserted early was
evicted while cold later entries survived)."""

import jax.numpy as jnp
import numpy as np

from semanticlens_tpu import causal
from semanticlens_tpu.collect.engine import CollectEngine
from semanticlens_tpu.models.base import SubjectModel, TapCollector


class _Toy(SubjectModel):
    module_names = ("t",)

    def init(self, rng):
        return {}

    def apply(self, params, x, tap_names=()):
        tap = TapCollector(tap_names)
        h = tap("t", x)
        return jnp.mean(h, axis=tuple(range(1, h.ndim))), tap.taps


def _engine():
    return CollectEngine(
        model=_Toy(),
        layer_names=("t",),
        aggregation_fn=lambda a: a.reshape(a.shape[0], -1),
        n_collect=2,
    )


def test_engine_step_cache_hit_refreshes_recency():
    eng = _engine()
    eng.max_compiled_steps = 2
    cache = {}
    eng._cache_step(cache, "hot", "hot-program")
    eng._cache_step(cache, "cold", "cold-program")
    assert eng._cache_hit(cache, "hot") == "hot-program"  # refresh
    eng._cache_step(cache, "new", "new-program")  # evicts LRU
    assert "hot" in cache, "hot entry evicted despite being most recently used"
    assert "cold" not in cache
    assert list(cache) == ["hot", "new"]


def test_causal_program_cache_hit_refreshes_recency(monkeypatch):
    monkeypatch.setattr(causal, "_MAX_PROGRAMS", 2)
    causal.clear_programs()
    causal._cache_program(("hot",), "hot-program")
    causal._cache_program(("cold",), "cold-program")
    assert causal._get_program(("hot",)) == "hot-program"  # refresh
    causal._cache_program(("new",), "new-program")
    assert causal._get_program(("hot",)) is not None
    assert causal._get_program(("cold",)) is None
    causal.clear_programs()


def test_causal_get_program_miss_returns_none():
    causal.clear_programs()
    assert causal._get_program(("nope",)) is None


def test_engine_real_hit_path_refreshes(monkeypatch):
    """End-to-end through _get_step: a second call must be a cache hit that
    moves the entry to the back of the eviction order."""
    eng = _engine()
    x = np.zeros((2, 4, 4, 3), np.float32)
    n_latents = eng.infer_n_latents({}, x.shape, np.float32)
    assert n_latents == {"t": 48}
    step1 = eng._get_step()
    step2 = eng._get_step()
    assert step1 is step2
    assert list(eng._steps)  # still cached
