"""Top-k state and persistence tests.

Includes the exact-value merge semantics test from the reference
(reference tests/component_visualization/test_activation_caching.py:14-30)
and a byte-format compatibility check against safetensors written the
reference way (torch bf16/int64).
"""

import ml_dtypes
import numpy as np
import pytest

from semanticlens_tpu.collect.activation_caching import ActMax, ActMaxCache
from semanticlens_tpu.ops.aggregators import aggregate_conv_mean
from semanticlens_tpu.ops.topk import init_topk, topk_merge, topk_update


class TestActMax:
    def test_initialization_and_update(self):
        act_max = ActMax(n_collect=5, n_latents=3)
        assert act_max.is_setup

        acts1 = np.array([[0.1, 0.9, 0.3], [0.2, 0.8, 0.4]], np.float32)
        ids1 = np.array([0, 1])
        act_max.update(acts1, ids1)

        acts2 = np.array([[0.9, 0.1, 0.5], [0.8, 0.2, 0.6]], np.float32)
        ids2 = np.array([2, 3])
        act_max.update(acts2, ids2)

        # Sorted descending, bf16, with 0.0/−1 sentinels for unfilled slots.
        np.testing.assert_allclose(
            act_max.activations[0].astype(np.float32),
            np.array([0.9, 0.8, 0.2, 0.1, 0.0], ml_dtypes.bfloat16).astype(np.float32),
        )
        np.testing.assert_array_equal(act_max.sample_ids[0], [2, 3, 1, 0, -1])

    def test_lazy_latent_inference(self):
        act_max = ActMax(n_collect=4)
        assert not act_max.is_setup
        act_max.update(np.random.default_rng(0).normal(size=(6, 7)).astype(np.float32), np.arange(6))
        assert act_max.is_setup
        assert act_max.n_latents == 7
        assert act_max.activations.shape == (7, 4)

    def test_negative_acts_lose_to_zero_sentinel(self):
        # Reference quirk (activation_caching.py:108): slots start at 0.0 in
        # bf16, so negative activations never fill empty slots.
        act_max = ActMax(n_collect=3, n_latents=1)
        act_max.update(np.array([[-1.0], [-2.0]], np.float32), np.array([0, 1]))
        np.testing.assert_array_equal(act_max.sample_ids[0], [-1, -1, -1])
        np.testing.assert_allclose(act_max.activations[0].astype(np.float32), [0.0, 0.0, 0.0])

    def test_store_and_load(self, tmp_path):
        file_path = tmp_path / "actmax.safetensors"
        original = ActMax(n_collect=5, n_latents=3)
        rng = np.random.default_rng(0)
        original.update(rng.random((10, 3)).astype(np.float32), np.arange(10))

        original.store(file_path, metadata={"n_collect": "5", "n_latents": "3"})
        loaded = ActMax.load(file_path)

        assert loaded.n_collect == 5
        assert loaded.n_latents == 3
        np.testing.assert_array_equal(
            original.activations.view(np.uint16), loaded.activations.view(np.uint16)
        )
        np.testing.assert_array_equal(original.sample_ids, loaded.sample_ids)

    def test_load_requires_metadata(self, tmp_path):
        from safetensors.numpy import save_file

        fp = tmp_path / "no_meta.safetensors"
        save_file({"activations": np.zeros((1, 1), ml_dtypes.bfloat16),
                   "sample_ids": np.zeros((1, 1), np.int64)}, str(fp))
        with pytest.raises(ValueError):
            ActMax.load(fp)

    def test_alive_latents(self):
        act_max = ActMax(n_collect=2, n_latents=3)
        acts = np.array([[0.0, 1.0, 0.0]], np.float32)
        act_max.update(acts, np.array([0]))
        np.testing.assert_array_equal(act_max.alive_latents, [1])


class TestTorchFormatParity:
    """Files must interoperate with the reference's torch-written format."""

    def test_load_torch_written_file(self, tmp_path):
        torch = pytest.importorskip("torch")
        from safetensors.torch import save_file as torch_save

        fp = tmp_path / "ref.safetensors"
        torch_save(
            {
                "activations": torch.tensor([[1.5, 0.25]], dtype=torch.bfloat16),
                "sample_ids": torch.tensor([[7, -1]], dtype=torch.int64),
            },
            str(fp),
            metadata={"n_collect": "2", "n_latents": "1"},
        )
        loaded = ActMax.load(fp)
        np.testing.assert_allclose(loaded.activations[0].astype(np.float32), [1.5, 0.25])
        np.testing.assert_array_equal(loaded.sample_ids[0], [7, -1])

    def test_torch_loads_our_file(self, tmp_path):
        torch = pytest.importorskip("torch")
        from safetensors.torch import load_file as torch_load

        act_max = ActMax(n_collect=2, n_latents=1)
        act_max.update(np.array([[3.0], [1.0]], np.float32), np.array([4, 5]))
        fp = tmp_path / "ours.safetensors"
        act_max.store(fp, metadata={"n_collect": "2", "n_latents": "1"})

        tensors = torch_load(str(fp))
        assert tensors["activations"].dtype == torch.bfloat16
        assert tensors["sample_ids"].dtype == torch.int64
        assert tensors["sample_ids"][0].tolist() == [4, 5]


class TestActMaxCache:
    def test_update_layer_and_counter(self):
        cache = ActMaxCache(["l1"], aggregation_fn=aggregate_conv_mean, n_collect=4)
        x = np.random.default_rng(0).normal(size=(3, 5, 5, 8)).astype(np.float32)
        cache.update_layer("l1", x)
        cache.update_layer("l1", x)
        assert cache.sample_idx_counter["l1"] == 6
        assert cache["l1"].activations.shape == (8, 4)
        # Sample ids must stay within the seen range.
        ids = cache["l1"].sample_ids
        assert ids.max() < 6

    def test_lambda_rejected(self):
        with pytest.raises(ValueError):
            ActMaxCache(["l1"], aggregation_fn=lambda x: x, n_collect=4)

    def test_store_and_load_roundtrip(self, tmp_path):
        cache = ActMaxCache(["0", "2"], aggregation_fn=aggregate_conv_mean, n_collect=10)
        rng = np.random.default_rng(1)
        cache.update_layer("0", rng.normal(size=(4, 30, 30, 8)).astype(np.float32))
        cache.update_layer("2", rng.normal(size=(4, 28, 28, 16)).astype(np.float32))
        cache.store(tmp_path / "actmax_cache")

        # Reference filename format: {agg_fn}-{n_collect}-{layer}.safetensors
        assert (tmp_path / "actmax_cache" / "aggregate_conv_mean-10-0.safetensors").exists()

        loaded = ActMaxCache(["0", "2"], aggregation_fn=aggregate_conv_mean, n_collect=10)
        loaded.load(tmp_path / "actmax_cache")
        np.testing.assert_array_equal(
            cache["0"].activations.view(np.uint16), loaded["0"].activations.view(np.uint16)
        )

    def test_load_missing_raises(self, tmp_path):
        cache = ActMaxCache(["0"], aggregation_fn=aggregate_conv_mean, n_collect=10)
        with pytest.raises(FileNotFoundError):
            cache.load(tmp_path / "nonexistent")

    def test_load_validates_n_collect(self, tmp_path):
        cache = ActMaxCache(["0"], aggregation_fn=aggregate_conv_mean, n_collect=10)
        cache.update_layer("0", np.random.default_rng(0).normal(size=(4, 8, 8, 4)).astype(np.float32))
        cache.store(tmp_path / "c")

        mismatched = ActMaxCache(["0"], aggregation_fn=aggregate_conv_mean, n_collect=5)
        with pytest.raises(FileNotFoundError):
            mismatched.load(tmp_path / "c")


class TestShardedMerge:
    def test_topk_merge_equals_global(self):
        """Merging per-shard states must equal a single global top-k."""
        import jax.numpy as jnp

        rng = np.random.default_rng(7)
        acts = rng.normal(size=(64, 6)).astype(np.float32)  # 64 samples, 6 latents
        ids = np.arange(64)

        # Global reference: one state over all samples.
        global_state = init_topk(6, 5)
        global_state = topk_update(global_state, jnp.asarray(acts), jnp.asarray(ids))

        # Sharded: 4 shards of 16 samples each, then merge.
        shard_states = []
        for s in range(4):
            st = init_topk(6, 5)
            sl = slice(16 * s, 16 * (s + 1))
            st = topk_update(st, jnp.asarray(acts[sl]), jnp.asarray(ids[sl]))
            shard_states.append(st)
        import jax

        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *shard_states)
        merged = topk_merge(stacked)

        np.testing.assert_array_equal(np.asarray(merged.values), np.asarray(global_state.values))
        np.testing.assert_array_equal(np.asarray(merged.ids), np.asarray(global_state.ids))


class TestActCache:
    def test_capture_raw_activations(self):
        import jax
        import jax.numpy as jnp

        from semanticlens_tpu.collect import ActCache
        from semanticlens_tpu.models.base import SubjectModel, TapCollector
        from semanticlens_tpu.models.layers import conv2d

        class OneConv(SubjectModel):
            module_names = ("c",)

            def apply(self, params, x, tap_names=()):
                tap = TapCollector(tap_names)
                return tap("c", conv2d(x, params["w"])), tap.taps

        model = OneConv()
        params = {"w": jnp.ones((1, 1, 3, 4), jnp.float32)}
        cache = ActCache(["c"])
        out = cache.capture(model, params, jnp.ones((2, 5, 5, 3), jnp.float32))
        assert out["c"].shape == (2, 5, 5, 4)
        np.testing.assert_allclose(out["c"], 3.0)
        cache.clear()
        assert cache.cache == {}
