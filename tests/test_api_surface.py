"""Direct tests for public API that was only covered indirectly.

Found by an untested-symbol sweep (public defs never named in tests/):
naming/denormalization helpers (reference API parity), the device-prefetch
pipeline, rank-dispatching aggregators, crop-range math, SigLIP 2-D specs,
and the one-shot attribution wrapper.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_get_fallback_name_matches_reference_scheme():
    """Same sha256-of-repr naming as the reference — cross-impl checked."""
    import importlib.util
    from pathlib import Path

    from semanticlens_tpu.utils.helper import get_fallback_name

    ref_helper = Path("/root/reference/semanticlens/utils/helper.py")
    if not ref_helper.exists():
        pytest.skip("reference not mounted")
    # the reference helper imports torchvision at module scope — reuse the
    # stub installed by test_reference_parity when present, else install one
    import sys
    import types

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.transforms = types.ModuleType("torchvision.transforms")
        tv.transforms._presets = types.ModuleType("torchvision.transforms._presets")
        tv.transforms._presets.ImageClassification = type("ImageClassification", (), {})
        tv.transforms.Compose = lambda ts: ts
        tv.transforms.Normalize = lambda *a, **k: None
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tv.transforms
        sys.modules["torchvision.transforms._presets"] = tv.transforms._presets
    spec = importlib.util.spec_from_file_location("ref_helper_direct", ref_helper)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    class Thing:
        def __repr__(self):
            return "Thing(alpha=1)"

    obj = Thing()
    assert get_fallback_name(obj) == mod.get_fallback_name(obj)


def test_denormalization_inverts_normalization():
    from semanticlens_tpu.utils.helper import get_denormalization_transform, make_preprocess_fn

    rng = np.random.default_rng(0)
    img = rng.random((1, 8, 8, 3)).astype(np.float32)
    mean, std = (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)
    normalized = (img - np.asarray(mean)) / np.asarray(std)
    denorm = get_denormalization_transform(mean, std)
    np.testing.assert_allclose(denorm(normalized), img, rtol=1e-5, atol=1e-6)


def test_device_prefetch_batches_order_and_placement():
    from semanticlens_tpu.data.dataset import Batch, device_prefetch_batches

    batches = [
        Batch(np.full((2, 4, 4, 3), i, np.uint8), i * 2, np.ones((2,), bool)) for i in range(5)
    ]
    out = list(device_prefetch_batches(iter(batches), depth=2))
    assert [start for _, start, _ in out] == [0, 2, 4, 6, 8]
    for i, (dev, _, _) in enumerate(out):
        assert isinstance(dev, jax.Array) and dev.dtype == jnp.uint8
        assert int(np.asarray(dev)[0, 0, 0, 0]) == i

    # sharded placement on the test mesh
    from jax.sharding import NamedSharding, PartitionSpec as P

    from semanticlens_tpu.core import data_mesh

    mesh = data_mesh(8)
    big = [Batch(np.zeros((8, 4, 4, 3), np.uint8), 0, np.ones((8,), bool))]
    (dev, _, _), = device_prefetch_batches(iter(big), sharding=NamedSharding(mesh, P("data")))
    assert dev.sharding.spec == P("data")


@pytest.mark.parametrize("name", ["sum", "mean", "max"])
def test_auto_aggregators_rank_dispatch(name):
    from semanticlens_tpu.ops import aggregators

    fn = getattr(aggregators, f"aggregate_{name}_auto")
    conv = jnp.asarray(np.random.default_rng(0).random((2, 4, 4, 3)).astype(np.float32))
    tok = jnp.asarray(np.random.default_rng(1).random((2, 5, 3)).astype(np.float32))
    red = {"sum": np.sum, "mean": np.mean, "max": np.max}[name]
    np.testing.assert_allclose(np.asarray(fn(conv)), red(np.asarray(conv), axis=(1, 2)), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(fn(tok)), red(np.asarray(tok), axis=1), rtol=1e-6)
    with pytest.raises(ValueError):
        fn(jnp.zeros((2, 3)))


def test_get_crop_range_thresholds_and_degenerate():
    from semanticlens_tpu.utils.render import get_crop_range

    heat = np.zeros((6, 8), np.float32)
    heat[2:4, 3:6] = 1.0
    r1, r2, c1, c2 = get_crop_range(heat, 0.5)
    assert (r1, r2, c1, c2) == (2, 4, 3, 6)
    # all-below-threshold → full image
    assert get_crop_range(np.zeros((6, 8), np.float32), 0.5) == (0, 6, 0, 8)


def test_component_heatmaps_one_shot_wrapper():
    from semanticlens_tpu.models import ResNet
    from semanticlens_tpu.relevance.attribution import component_heatmaps

    model = ResNet(depth=18, num_classes=10, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0))
    imgs = np.random.default_rng(0).random((2, 32, 32, 3)).astype(np.float32)
    heat = np.asarray(component_heatmaps(model, params, imgs, "layer2", 3, composite="gradient"))
    assert heat.shape == (2, 32, 32) and np.isfinite(heat).all()
    assert np.abs(heat).max() <= 1.0 + 1e-5  # abs_norm default


def test_siglip_2d_specs_shard_and_run():
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from semanticlens_tpu.foundation_models.siglip import (
        SigLIPConfig,
        init_siglip_params,
        siglip_encode_image,
    )
    from semanticlens_tpu.parallel import shard_clip_params, siglip_param_specs_2d

    devices = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devices, axis_names=("data", "model"))
    tiny = SigLIPConfig(
        embed_dim=32, image_size=16, patch_size=8,
        vision_width=32, vision_layers=2, vision_heads=4,
        text_width=32, text_layers=2, text_heads=4,
        vocab_size=64, context_length=8,
    )
    params = init_siglip_params(jax.random.PRNGKey(0), tiny)
    specs = siglip_param_specs_2d(tiny)
    sharded = shard_clip_params(params, mesh, specs)
    imgs = jax.device_put(jnp.zeros((4, 16, 16, 3), jnp.float32), NamedSharding(mesh, P("data")))
    out = jax.jit(lambda p, x: siglip_encode_image(p, tiny, x))(sharded, imgs)
    assert out.shape == (4, 32) and np.isfinite(np.asarray(out)).all()


def test_shard_batch_places_on_data_axis():
    from jax.sharding import PartitionSpec as P

    from semanticlens_tpu.core import data_mesh, shard_batch

    mesh = data_mesh(8)
    arr = shard_batch(np.zeros((16, 3), np.float32), mesh)
    assert arr.sharding.spec == P("data")


def test_mesh_helpers_cover_edge_branches():
    import jax

    from semanticlens_tpu.core import data_mesh
    from semanticlens_tpu.core.mesh import replicate, shard_concept_db

    with pytest.raises(ValueError, match="available"):
        data_mesh(10_000)

    mesh = data_mesh(4)
    tree = {"w": np.ones((3, 3), np.float32)}
    rep = replicate(tree, mesh)
    assert rep["w"].sharding.is_fully_replicated

    db = {
        "even": np.zeros((8, 2, 4), np.float32),
        "odd": np.zeros((7, 2, 4), np.float32),  # 7 % 4 != 0 → replicated
    }
    sharded = shard_concept_db(db, mesh)
    assert not sharded["even"].sharding.is_fully_replicated
    assert sharded["odd"].sharding.is_fully_replicated
    del jax


def test_enable_compilation_cache_idempotent(tmp_path):
    from semanticlens_tpu.core import enable_compilation_cache

    d = enable_compilation_cache(str(tmp_path / "xla"))
    assert d == str(tmp_path / "xla")
    import os

    assert os.path.isdir(d)
    assert enable_compilation_cache(d) == d  # second call: no-op


def test_abc_compat_shims():
    """The reference's torch device plumbing survives as no-op shims."""
    from semanticlens_tpu.collect.base import AbstractComponentVisualizer
    from semanticlens_tpu.foundation_models.base import AbstractVLM

    class MinimalCV(AbstractComponentVisualizer):
        def run(self, *a, **k):
            return {}

        def _compute_concept_db(self, fm, **k):
            return {}

        def get_max_reference(self, layer_name):
            return np.zeros((1, 1), np.int64)

        @property
        def caching(self):
            return False

        @property
        def storage_dir(self):
            return None

    cv = MinimalCV()
    assert cv.device is None and cv.to("cuda:0") is cv
    with pytest.raises(NotImplementedError):
        _ = cv.metadata

    class MinimalVLM(AbstractVLM):
        def encode_image(self, i):
            return i

        def encode_text(self, t):
            return t

        def preprocess(self, i):
            return i

        def tokenize(self, t):
            return t

    vlm = MinimalVLM()
    assert vlm.to("cuda:0") is vlm
