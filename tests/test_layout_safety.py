"""Serialization must be layout-safe: F-ordered host arrays round-trip intact.

On TPU backends ``np.asarray(jax_array)`` can return an **F-contiguous**
array (the device keeps the minor dimension first); safetensors serializes
the raw buffer assuming C order, so without an explicit
``np.ascontiguousarray`` every store written from TPU-resident state holds
transposed data. CPU-only suites never see it — these tests force F-ordered
inputs so the hazard reproduces on any backend. Found by driving the real
chip; fixed via ``utils.helper.host_c_array`` at every safetensors write.
"""

import numpy as np
import pytest
from safetensors.numpy import load_file

import jax.numpy as jnp

from semanticlens_tpu.collect.activation_caching import ActMax, ActMaxCache
from semanticlens_tpu.collect.engine import CollectEngine
from semanticlens_tpu.ops.aggregators import aggregate_conv_mean
from semanticlens_tpu.ops.topk import TopKState
from semanticlens_tpu.utils.helper import host_c_array


def _fortran_state(n_latents=16, k=5, seed=0):
    rng = np.random.default_rng(seed)
    values = np.asfortranarray(rng.normal(size=(n_latents, k)).astype(np.float32))
    ids = np.asfortranarray(rng.integers(0, 100, size=(n_latents, k)).astype(np.int32))
    assert not values.flags["C_CONTIGUOUS"]
    return TopKState(values=values, ids=ids)


def test_host_c_array_normalizes_fortran_input():
    st = _fortran_state()
    out = host_c_array(st.ids, np.int64)
    assert out.flags["C_CONTIGUOUS"]
    np.testing.assert_array_equal(out, np.asarray(st.ids))


def test_actmax_store_roundtrips_fortran_state(tmp_path):
    am = ActMax(n_collect=5, n_latents=16)
    am.state = _fortran_state()
    mem_ids = am.sample_ids.copy()
    mem_vals = am.activations.astype(np.float32).copy()

    fpath = tmp_path / "x.safetensors"
    am.store(fpath, metadata={"n_collect": "5", "n_latents": "16"})
    t = load_file(str(fpath))
    np.testing.assert_array_equal(t["sample_ids"], mem_ids)
    np.testing.assert_array_equal(t["activations"].astype(np.float32), mem_vals)

    loaded = ActMax.load(fpath)
    np.testing.assert_array_equal(loaded.sample_ids, mem_ids)


def test_engine_checkpoint_roundtrips_fortran_state(tmp_path):
    class _NoModel:
        def apply(self, params, x, names):  # pragma: no cover - never called
            raise AssertionError

    engine = CollectEngine(
        model=_NoModel(), layer_names=("l",), aggregation_fn=aggregate_conv_mean, n_collect=5
    )
    st = _fortran_state(seed=3)
    engine.save_checkpoint(tmp_path, {"l": st}, next_start=7)
    states, nxt = engine.load_checkpoint(tmp_path)
    assert nxt == 7
    np.testing.assert_array_equal(np.asarray(states["l"].ids), np.asarray(st.ids))
    np.testing.assert_array_equal(
        np.asarray(states["l"].values, np.float32),
        np.asarray(jnp.asarray(st.values).astype(jnp.bfloat16), np.float32),
    )


def test_cache_store_load_roundtrips_fortran_state(tmp_path):
    cache = ActMaxCache(["l"], aggregate_conv_mean, n_collect=5)
    cache["l"].n_latents = 16
    cache["l"].state = _fortran_state(seed=5)
    cache.sample_idx_counter["l"] = 100
    mem_ids = cache["l"].sample_ids.copy()
    cache.store(tmp_path)

    fresh = ActMaxCache(["l"], aggregate_conv_mean, n_collect=5)
    fresh.load(tmp_path)
    np.testing.assert_array_equal(fresh["l"].sample_ids, mem_ids)


def test_concept_db_save_is_layout_safe(tmp_path):
    # The Lens cache-save path must write F-ordered inputs correctly.
    from safetensors.numpy import save_file

    arr = np.asfortranarray(np.arange(24, dtype=np.float32).reshape(4, 6) ** 2)
    save_file({"v": host_c_array(arr, np.float32)}, str(tmp_path / "db.safetensors"))
    back = load_file(str(tmp_path / "db.safetensors"))["v"]
    np.testing.assert_array_equal(back, arr)


@pytest.mark.parametrize("shape", [(3, 4), (2, 3, 4), (5,)])
def test_host_c_array_shapes_and_dtypes(shape):
    x = jnp.arange(int(np.prod(shape))).reshape(shape)
    out = host_c_array(x, np.float32)
    assert out.shape == shape and out.dtype == np.float32 and out.flags["C_CONTIGUOUS"]


@pytest.mark.parametrize("seed", range(5))
def test_actmax_roundtrip_fuzz(tmp_path, seed):
    """Randomized shapes/k/values (incl. F-order, negatives, sentinel rows)
    must round-trip bit-exactly through the safetensors tier."""
    rng = np.random.default_rng(seed)
    c = int(rng.integers(1, 40))
    k = int(rng.integers(1, 12))
    vals = rng.normal(scale=10.0 ** rng.integers(-3, 3), size=(c, k)).astype(np.float32)
    ids = rng.integers(-1, 10_000, size=(c, k)).astype(np.int32)
    # random rows become pure-sentinel (never-filled components)
    dead = rng.random(c) < 0.3
    vals[dead] = 0.0
    ids[dead] = -1
    if seed % 2:
        vals, ids = np.asfortranarray(vals), np.asfortranarray(ids)

    am = ActMax(n_collect=k, n_latents=c)
    am.state = TopKState(values=vals, ids=ids)
    fpath = tmp_path / f"fuzz{seed}.safetensors"
    am.store(fpath, metadata={"n_collect": str(k), "n_latents": str(c)})
    back = ActMax.load(fpath)
    np.testing.assert_array_equal(back.sample_ids, am.sample_ids)
    np.testing.assert_array_equal(
        back.activations.view(np.uint16), am.activations.view(np.uint16)
    )
