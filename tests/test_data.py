"""Data pipeline tests: batching, padding, prefetch, ImageFolder, resume."""

import numpy as np
import pytest

from semanticlens_tpu.data import ArrayDataset, ImageFolder, iter_batches, prefetch_batches
from semanticlens_tpu.ops.aggregators import aggregate_conv_mean


def test_iter_batches_padding():
    ds = ArrayDataset(np.arange(10 * 4 * 4 * 3, dtype=np.float32).reshape(10, 4, 4, 3), name="d")
    batches = list(iter_batches(ds, 4))
    assert len(batches) == 3
    assert batches[2].valid.tolist() == [True, True, False, False]
    np.testing.assert_array_equal(batches[2].images[2:], 0)
    assert [b.start_index for b in batches] == [0, 4, 8]


def test_iter_batches_start_index():
    ds = ArrayDataset(np.zeros((12, 2, 2, 3), np.float32), name="d")
    batches = list(iter_batches(ds, 4, start_index=8))
    assert [b.start_index for b in batches] == [8]


def test_iter_batches_slow_path():
    class ListDs:
        def __len__(self):
            return 5

        def __getitem__(self, i):
            return np.full((2, 2, 3), i, np.float32), i

    batches = list(iter_batches(ListDs(), 2))
    assert len(batches) == 3
    np.testing.assert_array_equal(batches[1].images[0], np.full((2, 2, 3), 2))


def test_prefetch_preserves_order_and_propagates_errors():
    items = list(prefetch_batches(iter(range(20)), depth=3))
    assert items == list(range(20))

    def boom():
        yield 1
        raise RuntimeError("decode failed")

    it = prefetch_batches(boom(), depth=2)
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="decode failed"):
        list(it)


@pytest.fixture
def image_dir(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(0)
    for cls in ["cat", "dog"]:
        d = tmp_path / cls
        d.mkdir()
        for i in range(3):
            arr = rng.integers(0, 255, size=(50, 70, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"{i}.png")
    return tmp_path


def test_image_folder(image_dir):
    ds = ImageFolder(image_dir, image_size=32)
    assert len(ds) == 6
    img, label = ds[0]
    assert img.shape == (32, 32, 3) and img.dtype == np.uint8
    assert ds.class_to_idx == {"cat": 0, "dog": 1}
    labels = {ds[i][1] for i in range(6)}
    assert labels == {0, 1}


def test_image_folder_empty_raises(tmp_path):
    (tmp_path / "empty").mkdir()
    with pytest.raises(ValueError):
        ImageFolder(tmp_path / "empty")
    with pytest.raises(FileNotFoundError):
        ImageFolder(tmp_path / "missing")


def test_engine_checkpoint_resume(tmp_path):
    """Interrupted collect sweeps resume from the last flush with identical
    final state."""
    import jax
    import jax.numpy as jnp

    from semanticlens_tpu.collect.engine import CollectEngine
    from semanticlens_tpu.models.base import SubjectModel, TapCollector
    from semanticlens_tpu.models.layers import conv2d
    from semanticlens_tpu.ops.aggregators import aggregate_conv_mean

    class OneConv(SubjectModel):
        module_names = ("c",)

        def apply(self, params, x, tap_names=()):
            tap = TapCollector(tap_names)
            return tap("c", conv2d(x, params["w"])), tap.taps

    model = OneConv()
    params = {"w": jnp.asarray(np.random.default_rng(0).normal(size=(1, 1, 3, 6)).astype(np.float32))}
    ds = ArrayDataset(np.random.default_rng(1).normal(size=(32, 8, 8, 3)).astype(np.float32), name="d")

    def make_engine():
        return CollectEngine(model=model, layer_names=("c",), aggregation_fn=aggregate_conv_mean, n_collect=5)

    # Full run, no checkpointing.
    ref_states, _ = make_engine().run(params, ds, 8)

    # Partial run: process half, checkpoint, "crash".
    eng = make_engine()
    half = ArrayDataset(ds.images[:16], name="d")
    states_half, _ = eng.run(params, half, 8, checkpoint_dir=tmp_path, checkpoint_every=1)
    assert (tmp_path / "progress.json").exists()

    # Resume on the full dataset from the checkpoint.
    eng2 = make_engine()
    resumed, _ = eng2.run(params, ds, 8, checkpoint_dir=tmp_path, checkpoint_every=1)
    np.testing.assert_array_equal(
        np.asarray(resumed["c"].ids), np.asarray(ref_states["c"].ids)
    )
    np.testing.assert_array_equal(
        np.asarray(resumed["c"].values, np.float32), np.asarray(ref_states["c"].values, np.float32)
    )


def test_grain_adapter_protocol():
    from semanticlens_tpu.data import GrainDataset, host_shard_range

    records = [{"img": np.full((4, 4, 3), i, np.uint8), "label": i % 2} for i in range(10)]
    ds = GrainDataset(records, transform=lambda r: (r["img"], r["label"]), name="grain-fake")
    assert len(ds) == 10
    img, label = ds[3]
    assert img.shape == (4, 4, 3) and label == 1
    batches = list(iter_batches(ds, 4))
    assert len(batches) == 3

    # Host shard ranges tile the dataset without overlap.
    ranges = [host_shard_range(10, process_index=i, process_count=3) for i in range(3)]
    assert ranges == [(0, 4), (4, 8), (8, 10)]


def test_to_transforms_compose_from_preset_like():
    import jax.numpy as jnp

    from semanticlens_tpu.utils import to_transforms_compose

    class PresetLike:  # mimics torchvision ImageClassification attributes
        resize_size = [48]
        crop_size = [32]
        mean = (0.5, 0.5, 0.5)
        std = (0.25, 0.25, 0.25)
        interpolation = "InterpolationMode.BICUBIC"

    fn = to_transforms_compose(PresetLike())
    out = fn(jnp.zeros((2, 64, 96, 3), jnp.uint8))
    assert out.shape == (2, 32, 32, 3)
    np.testing.assert_allclose(np.asarray(out)[0, 0, 0], (0.0 - 0.5) / 0.25, rtol=1e-5)


def test_engine_checkpoint_resume_with_mesh(tmp_path):
    """Checkpoint/resume must also work for mesh-sharded states (D, C, k)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from semanticlens_tpu.collect.engine import CollectEngine
    from semanticlens_tpu.models.base import SubjectModel, TapCollector
    from semanticlens_tpu.models.layers import conv2d
    from semanticlens_tpu.ops.aggregators import aggregate_conv_mean

    class OneConv(SubjectModel):
        module_names = ("c",)

        def apply(self, params, x, tap_names=()):
            tap = TapCollector(tap_names)
            return tap("c", conv2d(x, params["w"])), tap.taps

    mesh = Mesh(np.array(__import__("jax").devices()[:8]), axis_names=("data",))
    model = OneConv()
    params = {"w": jnp.asarray(np.random.default_rng(0).normal(size=(1, 1, 3, 6)).astype(np.float32))}
    ds = ArrayDataset(np.random.default_rng(1).normal(size=(32, 8, 8, 3)).astype(np.float32), name="d")

    def mk():
        return CollectEngine(model=model, layer_names=("c",),
                             aggregation_fn=aggregate_conv_mean, n_collect=5, mesh=mesh)

    ref, _ = mk().run(params, ds, 16)
    half = ArrayDataset(ds.images[:16], name="d")
    mk().run(params, half, 16, checkpoint_dir=tmp_path, checkpoint_every=1)
    resumed, _ = mk().run(params, ds, 16, checkpoint_dir=tmp_path, checkpoint_every=1)
    np.testing.assert_array_equal(np.asarray(resumed["c"].ids), np.asarray(ref["c"].ids))


def _one_conv_fixture():
    import jax.numpy as jnp

    from semanticlens_tpu.models.base import SubjectModel, TapCollector
    from semanticlens_tpu.models.layers import conv2d

    class OneConv(SubjectModel):
        module_names = ("c",)

        def apply(self, params, x, tap_names=()):
            tap = TapCollector(tap_names)
            return tap("c", conv2d(x, params["w"])), tap.taps

    params = {"w": jnp.asarray(np.random.default_rng(0).normal(size=(1, 1, 3, 6)).astype(np.float32))}
    ds = ArrayDataset(np.random.default_rng(1).normal(size=(40, 8, 8, 3)).astype(np.float32), name="d")
    return OneConv(), params, ds


def _mean_embed(batch):
    import jax.numpy as jnp

    return jnp.mean(batch.astype(jnp.float32), axis=(1, 2))


def test_run_fused_checkpoint_resume_after_crash(tmp_path):
    """Kill a fused sweep mid-flight; the rerun must reproduce an
    uninterrupted run bit-for-bit (states AND embedding table)."""
    from semanticlens_tpu.collect.engine import CollectEngine

    model, params, ds = _one_conv_fixture()

    def mk():
        return CollectEngine(model=model, layer_names=("c",), aggregation_fn=aggregate_conv_mean, n_collect=5)

    ref_states, ref_embeds, n = mk().run_fused(params, ds, 8, _mean_embed)

    class Boom(RuntimeError):
        pass

    calls = {"n": 0}

    def crashing_embed(batch):
        calls["n"] += 1
        if calls["n"] > 3:
            raise Boom("simulated preemption")
        return _mean_embed(batch)

    ckpt = tmp_path / "fused"
    with pytest.raises(Boom):
        mk().run_fused(params, ds, 8, crashing_embed, checkpoint_dir=ckpt, checkpoint_every=1)
    assert (ckpt / "progress.json").exists()
    assert list(ckpt.glob("embeds-*.safetensors")), "no embed chunks persisted before crash"

    resumed_states, resumed_embeds, n2 = mk().run_fused(
        params, ds, 8, _mean_embed, checkpoint_dir=ckpt, checkpoint_every=1
    )
    assert n2 == n
    np.testing.assert_array_equal(resumed_embeds, ref_embeds)
    np.testing.assert_array_equal(np.asarray(resumed_states["c"].ids), np.asarray(ref_states["c"].ids))
    np.testing.assert_array_equal(
        np.asarray(resumed_states["c"].values, np.float32),
        np.asarray(ref_states["c"].values, np.float32),
    )

    CollectEngine.clear_checkpoint(ckpt)
    assert not ckpt.exists()


def test_run_fused_checkpoint_gap_detection(tmp_path):
    """A missing embed chunk must fail loudly, not silently mis-index rows."""
    from semanticlens_tpu.collect.engine import CollectEngine

    model, params, ds = _one_conv_fixture()
    eng = CollectEngine(model=model, layer_names=("c",), aggregation_fn=aggregate_conv_mean, n_collect=5)
    ckpt = tmp_path / "fused"
    eng.run_fused(params, ds, 8, _mean_embed, checkpoint_dir=ckpt, checkpoint_every=1)
    chunks = sorted(ckpt.glob("embeds-*.safetensors"))
    chunks[1].unlink()
    eng2 = CollectEngine(model=model, layer_names=("c",), aggregation_fn=aggregate_conv_mean, n_collect=5)
    with pytest.raises(RuntimeError, match="gap"):
        eng2.run_fused(params, ds, 8, _mean_embed, checkpoint_dir=ckpt, checkpoint_every=1)


def test_run_fused_checkpoint_resume_with_mesh(tmp_path):
    """Fused checkpoint/resume with mesh-sharded (D, C, k) states."""
    import jax
    from jax.sharding import Mesh

    from semanticlens_tpu.collect.engine import CollectEngine

    model, params, ds = _one_conv_fixture()
    mesh = Mesh(np.array(jax.devices()[:8]), axis_names=("data",))

    def mk():
        return CollectEngine(model=model, layer_names=("c",),
                             aggregation_fn=aggregate_conv_mean, n_collect=5, mesh=mesh)

    ref_states, ref_embeds, _ = mk().run_fused(params, ds, 16, _mean_embed)
    half = ArrayDataset(ds.images[:16], name="d")
    ckpt = tmp_path / "fused-mesh"
    mk().run_fused(params, half, 16, _mean_embed, checkpoint_dir=ckpt, checkpoint_every=1)
    resumed, resumed_embeds, _ = mk().run_fused(
        params, ds, 16, _mean_embed, checkpoint_dir=ckpt, checkpoint_every=1
    )
    np.testing.assert_array_equal(np.asarray(resumed["c"].ids), np.asarray(ref_states["c"].ids))
    np.testing.assert_array_equal(resumed_embeds, ref_embeds)


def test_run_fused_combined_program_matches_legacy(tmp_path):
    """embed_params path (one XLA program/batch) == legacy two-dispatch path."""
    import jax.numpy as jnp

    from semanticlens_tpu.collect.engine import CollectEngine

    model, params, ds = _one_conv_fixture()

    def mk():
        return CollectEngine(model=model, layer_names=("c",), aggregation_fn=aggregate_conv_mean, n_collect=5)

    proj = jnp.asarray(np.random.default_rng(5).normal(size=(3, 7)).astype(np.float32))

    def legacy_embed(batch):
        return jnp.mean(batch.astype(jnp.float32), axis=(1, 2)) @ proj

    def fused_embed(p, batch):
        return jnp.mean(batch.astype(jnp.float32), axis=(1, 2)) @ p

    ref_states, ref_embeds, n = mk().run_fused(params, ds, 8, legacy_embed)
    eng = mk()
    states, embeds, n2 = eng.run_fused(params, ds, 8, fused_embed, embed_params=proj)
    assert n == n2
    np.testing.assert_allclose(embeds, ref_embeds, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(states["c"].ids), np.asarray(ref_states["c"].ids))
    # the combined step is memoized per embed_fn object
    assert len(eng._fused_steps) == 1
    eng.run_fused(params, ds, 8, fused_embed, embed_params=proj)
    assert len(eng._fused_steps) == 1


def test_run_fused_combined_with_mesh_and_checkpoint(tmp_path):
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from semanticlens_tpu.collect.engine import CollectEngine

    model, params, ds = _one_conv_fixture()
    mesh = Mesh(np.array(jax.devices()[:8]), axis_names=("data",))
    proj = jnp.asarray(np.random.default_rng(5).normal(size=(3, 7)).astype(np.float32))

    def fused_embed(p, batch):
        return jnp.mean(batch.astype(jnp.float32), axis=(1, 2)) @ p

    def mk():
        return CollectEngine(model=model, layer_names=("c",),
                             aggregation_fn=aggregate_conv_mean, n_collect=5, mesh=mesh)

    ref_states, ref_embeds, _ = mk().run_fused(params, ds, 8, fused_embed, embed_params=proj)
    half = ArrayDataset(ds.images[:16], name="d")
    ckpt = tmp_path / "fused-combined"
    mk().run_fused(params, half, 8, fused_embed, embed_params=proj,
                   checkpoint_dir=ckpt, checkpoint_every=1)
    resumed, embeds, _ = mk().run_fused(params, ds, 8, fused_embed, embed_params=proj,
                                        checkpoint_dir=ckpt, checkpoint_every=1)
    np.testing.assert_array_equal(np.asarray(resumed["c"].ids), np.asarray(ref_states["c"].ids))
    np.testing.assert_array_equal(embeds, ref_embeds)


def test_run_fused_resume_drops_uncommitted_chunk(tmp_path):
    """Crash between a chunk write and its progress commit must not duplicate
    rows: the stale trailing chunk is dropped and its samples recomputed."""
    from safetensors.numpy import load_file, save_file

    from semanticlens_tpu.collect.engine import CollectEngine

    model, params, ds = _one_conv_fixture()

    def mk():
        return CollectEngine(model=model, layer_names=("c",), aggregation_fn=aggregate_conv_mean, n_collect=5)

    ref_states, ref_embeds, n = mk().run_fused(params, ds, 8, _mean_embed)

    # build a checkpoint: sweep half the data committed...
    half = ArrayDataset(ds.images[:16], name="d")
    ckpt = tmp_path / "fused"
    mk().run_fused(params, half, 8, _mean_embed, checkpoint_dir=ckpt, checkpoint_every=1)
    # ...then simulate the crash window: a chunk written beyond the committed
    # progress (progress.json still says 16)
    stale = load_file(str(sorted(ckpt.glob("embeds-*.safetensors"))[0]))["embeds"]
    save_file({"embeds": np.full_like(stale, 777.0)}, str(ckpt / f"embeds-{16:012d}.safetensors"))

    resumed_states, resumed_embeds, _ = mk().run_fused(
        params, ds, 8, _mean_embed, checkpoint_dir=ckpt, checkpoint_every=1
    )
    assert resumed_embeds.shape == ref_embeds.shape, "stale chunk duplicated rows"
    np.testing.assert_array_equal(resumed_embeds, ref_embeds)
    np.testing.assert_array_equal(np.asarray(resumed_states["c"].ids), np.asarray(ref_states["c"].ids))


def test_real_grain_mapdataset_through_engine():
    """A genuine grain.MapDataset drives the collect engine end to end."""
    grain = pytest.importorskip("grain")

    import jax
    import jax.numpy as jnp

    from semanticlens_tpu.collect.engine import CollectEngine
    from semanticlens_tpu.data import GrainDataset

    rng = np.random.default_rng(0)
    records = [{"img": rng.normal(size=(8, 8, 3)).astype(np.float32), "label": i % 3} for i in range(20)]
    source = grain.MapDataset.source(records).map(lambda r: (r["img"], r["label"]))
    ds = GrainDataset(source, name="grain-real")
    assert len(ds) == 20 and ds[3][1] == 0

    model, params, _ = _one_conv_fixture()
    eng = CollectEngine(model=model, layer_names=("c",), aggregation_fn=aggregate_conv_mean, n_collect=4)
    states, seen = eng.run(params, ds, 8)
    assert seen == 20
    ids = np.asarray(states["c"].ids)
    assert (ids[ids >= 0] < 20).all()

    # identical result from the equivalent ArrayDataset
    arr = ArrayDataset(np.stack([r["img"] for r in records]), name="arr")
    eng2 = CollectEngine(model=model, layer_names=("c",), aggregation_fn=aggregate_conv_mean, n_collect=4)
    ref, _ = eng2.run(params, arr, 8)
    np.testing.assert_array_equal(ids, np.asarray(ref["c"].ids))
