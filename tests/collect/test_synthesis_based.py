"""Feature synthesis: optimization-based concept examples (featviz.py +
collect/synthesis_based.py), a beyond-reference Collect strategy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semanticlens_tpu.collect.synthesis_based import SynthesisComponentVisualizer
from semanticlens_tpu.featviz import SynthesisConfig, synthesize
from semanticlens_tpu.models.base import SubjectModel, TapCollector
from semanticlens_tpu.models.layers import conv2d
from semanticlens_tpu.ops.aggregators import aggregate_conv_mean, aggregate_transformer_mean

IMG = 16
FAST = SynthesisConfig(steps=48, lr=0.1, jitter=2, tv=0.0, l2=1e-4)


class TinyConvNet(SubjectModel):
    module_names = ("0", "1")

    def init(self, rng):
        k1, k2 = jax.random.split(rng)
        return {
            "0.weight": jax.random.normal(k1, (3, 3, 3, 8), jnp.float32) * 0.2,
            "1.weight": jax.random.normal(k2, (3, 3, 8, 6), jnp.float32) * 0.2,
        }

    def apply(self, params, x, tap_names=()):
        tap = TapCollector(tap_names)
        x = tap("0", jax.nn.relu(conv2d(x, params["0.weight"], padding=1)))
        x = tap("1", conv2d(x, params["1.weight"], padding=1))
        return x, tap.taps


class TokenToy(SubjectModel):
    """(B, H, W, 3) → (B, T, D) tokens; exercises transformer aggregators."""

    module_names = ("proj",)

    def init(self, rng):
        return {"w": jax.random.normal(rng, (3, 5), jnp.float32)}

    def apply(self, params, x, tap_names=()):
        tap = TapCollector(tap_names)
        tokens = x.reshape(x.shape[0], -1, 3) @ params["w"]
        tokens = tap("proj", jnp.tanh(tokens))
        return tokens, tap.taps


@pytest.fixture(scope="module")
def toy():
    model = TinyConvNet()
    model.params = model.init(jax.random.PRNGKey(0))
    model.name = "tiny-synth"
    return model


def _preprocess(x):
    return x / 255.0


def test_synthesize_beats_random_init(toy):
    ids = [0, 3, 5]
    images, objective = synthesize(
        toy, toy.params, "0", ids, aggregate_conv_mean,
        image_size=IMG, model_preprocess=_preprocess, config=FAST, seed=0,
    )
    assert images.shape == (3, IMG, IMG, 3)
    assert images.min() >= 0.0 and images.max() <= 1.0
    # baseline: the same objective on random noise images
    rng = np.random.default_rng(0)
    noise = jnp.asarray(rng.uniform(size=(3, IMG, IMG, 3)).astype(np.float32))
    _, taps = toy.apply(toy.params, _preprocess(noise * 255.0), tap_names=("0",))
    base = np.asarray(aggregate_conv_mean(taps["0"]))[np.arange(3), ids]
    assert (objective > base + 1e-3).all(), (objective, base)


def test_synthesize_is_deterministic(toy):
    a = synthesize(toy, toy.params, "0", [1], aggregate_conv_mean,
                   image_size=IMG, model_preprocess=_preprocess, config=FAST, seed=7)
    b = synthesize(toy, toy.params, "0", [1], aggregate_conv_mean,
                   image_size=IMG, model_preprocess=_preprocess, config=FAST, seed=7)
    np.testing.assert_array_equal(a[0], b[0])


def test_synthesize_trace_monotone_trend(toy):
    _, _, trace = synthesize(
        toy, toy.params, "0", [0, 1], aggregate_conv_mean,
        image_size=IMG, model_preprocess=_preprocess, config=FAST, seed=0,
        return_trace=True,
    )
    assert trace.shape == (FAST.steps,)
    assert trace[-8:].mean() > trace[:8].mean()  # ascent actually ascends


def test_synthesize_transformer_tap():
    model = TokenToy()
    model.params = model.init(jax.random.PRNGKey(1))
    model.name = "token-toy"
    images, objective = synthesize(
        model, model.params, "proj", [0, 4], aggregate_transformer_mean,
        image_size=8, model_preprocess=_preprocess, config=FAST, seed=0,
    )
    assert images.shape == (2, 8, 8, 3)
    assert np.isfinite(objective).all()


def test_synthesize_rejects_bad_aggregate(toy):
    with pytest.raises(ValueError, match="batch, components"):
        synthesize(toy, toy.params, "0", [0], lambda t: t,  # rank-4 output
                   image_size=IMG, model_preprocess=_preprocess, config=FAST)


class FakeVLM:
    name = "fake-vlm"
    embed_dim = 12

    def preprocess(self, img):
        arr = np.asarray(img, np.float32)
        if arr.ndim == 3:
            arr = arr[None]
        return jnp.asarray(arr)

    def encode_image(self, img):
        rng = np.random.default_rng(5)
        proj = jnp.asarray(rng.normal(size=(3, self.embed_dim)).astype(np.float32))
        return jnp.mean(img, axis=(1, 2)) @ proj


def _make_cv(toy, tmp_path=None, **kw):
    return SynthesisComponentVisualizer(
        toy, ["0"], {"0": 4}, num_samples=2, aggregate_fn=aggregate_conv_mean,
        image_size=IMG, model_preprocess=_preprocess, config=FAST,
        cache_dir=str(tmp_path) if tmp_path else None, max_batch=8, **kw,
    )


def test_cv_gallery_and_concept_db(toy):
    cv = _make_cv(toy)
    gallery = cv.run()
    assert gallery["0"].shape == (4, 2, IMG, IMG, 3)
    assert np.isfinite(cv.objectives["0"]).all()
    db = cv._compute_concept_db(FakeVLM(), batch_size=4)
    assert db["0"].shape == (4, 2, FakeVLM.embed_dim)
    # embeds match encoding the gallery directly
    flat = (gallery["0"].reshape(8, IMG, IMG, 3) * 255.0).astype(np.uint8)
    fm = FakeVLM()
    direct = np.asarray(fm.encode_image(fm.preprocess(flat)), np.float32).reshape(4, 2, -1)
    np.testing.assert_allclose(db["0"], direct, atol=1e-5)
    assert cv.get_max_reference("0").shape == (4, 2)


def test_cv_cache_roundtrip(toy, tmp_path):
    cv1 = _make_cv(toy, tmp_path)
    cv1.run()
    path = cv1._gallery_path("0")
    assert path.exists()
    cv2 = _make_cv(toy, tmp_path)
    cv2.run()
    # uint8 storage: quantized equality
    np.testing.assert_allclose(cv1.gallery["0"], cv2.gallery["0"], atol=1 / 255.0)
    np.testing.assert_array_equal(cv1.objectives["0"], cv2.objectives["0"])


def test_cv_through_lens_analyze(toy, tmp_path):
    from semanticlens_tpu.lens import Lens

    cv = _make_cv(toy, tmp_path)
    lens = Lens(FakeVLM())
    db = lens.compute_concept_db(cv, batch_size=4)
    assert set(db) == {"0"} and db["0"].shape == (4, 2, FakeVLM.embed_dim)
    cached = lens.compute_concept_db(cv, batch_size=4)  # second call hits cache
    np.testing.assert_allclose(cached["0"], db["0"], atol=1e-6)
    from semanticlens_tpu import scores

    clarity = np.asarray(scores.clarity_score(jnp.asarray(db["0"])))
    assert clarity.shape == (4,) and np.isfinite(clarity).all()


def test_cv_rejects_unknown_layer(toy):
    with pytest.raises(ValueError, match="not found"):
        SynthesisComponentVisualizer(
            toy, ["nope"], 4, num_samples=2, aggregate_fn=aggregate_conv_mean)


def test_cv_requires_component_counts(toy):
    with pytest.raises(ValueError, match="missing entries"):
        SynthesisComponentVisualizer(
            toy, ["0", "1"], {"0": 4}, num_samples=2, aggregate_fn=aggregate_conv_mean)


def test_host_loop_bit_equals_scan(toy):
    from semanticlens_tpu import featviz

    a = synthesize(toy, toy.params, "0", [0, 2], aggregate_conv_mean,
                   image_size=IMG, model_preprocess=_preprocess, config=FAST, seed=3,
                   loop="scan")
    b = synthesize(toy, toy.params, "0", [0, 2], aggregate_conv_mean,
                   image_size=IMG, model_preprocess=_preprocess, config=FAST, seed=3,
                   loop="host")
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])
    featviz.clear_programs()


def test_program_memo_reuses_across_component_sets(toy):
    from semanticlens_tpu import featviz

    featviz.clear_programs()
    synthesize(toy, toy.params, "0", [0, 1], aggregate_conv_mean,
               image_size=IMG, model_preprocess=_preprocess, config=FAST, seed=0)
    assert len(featviz._PROGRAMS) == 1
    # different component ids, same shapes -> SAME program (ids are traced args)
    synthesize(toy, toy.params, "0", [5, 6], aggregate_conv_mean,
               image_size=IMG, model_preprocess=_preprocess, config=FAST, seed=0)
    assert len(featviz._PROGRAMS) == 1
    # different K -> new program
    synthesize(toy, toy.params, "0", [1], aggregate_conv_mean,
               image_size=IMG, model_preprocess=_preprocess, config=FAST, seed=0)
    assert len(featviz._PROGRAMS) == 2
    featviz.clear_programs()
    assert not featviz._PROGRAMS


def test_rejects_unknown_loop_mode(toy):
    with pytest.raises(ValueError, match="scan.*host"):
        synthesize(toy, toy.params, "0", [0], aggregate_conv_mean,
                   image_size=IMG, model_preprocess=_preprocess, config=FAST, loop="nope")


def test_mesh_sharded_synthesis_matches_unsharded(toy):
    from jax.sharding import Mesh
    from semanticlens_tpu import featviz

    featviz.clear_programs()
    mesh = Mesh(np.array(jax.devices()[:8]), axis_names=("data",))
    kw = dict(image_size=IMG, model_preprocess=_preprocess, config=FAST, seed=2)
    a = synthesize(toy, toy.params, "0", list(range(8)), aggregate_conv_mean, **kw)
    b = synthesize(toy, toy.params, "0", list(range(8)), aggregate_conv_mean,
                   mesh=mesh, **kw)
    np.testing.assert_allclose(a[0], b[0], atol=2e-6)
    np.testing.assert_allclose(a[1], b[1], rtol=1e-5)
    featviz.clear_programs()


def test_mesh_rejects_indivisible_k(toy):
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()[:8]), axis_names=("data",))
    with pytest.raises(ValueError, match="divide the mesh"):
        synthesize(toy, toy.params, "0", [0, 1, 2], aggregate_conv_mean,
                   image_size=IMG, model_preprocess=_preprocess, config=FAST, mesh=mesh)


def test_cv_visualize_components(toy, tmp_path):
    cv = _make_cv(toy, tmp_path)
    fpath = cv.visualize_components([0, 1], layer_name="0")
    assert fpath is not None and fpath.exists() and fpath.stat().st_size > 1000
    assert _make_cv(toy).visualize_components([0], layer_name="0") is None  # caching off
    with pytest.raises(ValueError, match="not found"):
        cv.visualize_components([0], layer_name="nope")


def test_cache_misses_on_config_change(toy, tmp_path):
    """Changing any synthesis hyper-parameter must NOT reload a stale gallery."""
    cv1 = _make_cv(toy, tmp_path)
    cv1.run()
    other = SynthesisComponentVisualizer(
        toy, ["0"], {"0": 4}, num_samples=2, aggregate_fn=aggregate_conv_mean,
        image_size=IMG, model_preprocess=_preprocess,
        config=SynthesisConfig(steps=48, lr=0.05, jitter=2, tv=0.0, l2=1e-4),  # lr differs
        cache_dir=str(tmp_path), max_batch=8,
    )
    assert other._gallery_path("0") != cv1._gallery_path("0")
    assert other.metadata["config"] != cv1.metadata["config"]


def test_cache_digest_covers_objective_and_shape(toy, tmp_path):
    """n_components / max_batch / aggregator changes must MISS the gallery
    cache (ADVICE round 4): a gallery optimized under a different objective
    or chunking is wrong evidence, not a hit."""
    from semanticlens_tpu.ops.aggregators import aggregate_conv_max

    base = _make_cv(toy, tmp_path)
    variants = [
        dict(n_components={"0": 3}),
        dict(max_batch=4),
        dict(aggregate_fn=aggregate_conv_max),
    ]
    paths = {base._gallery_path("0")}
    for kw in variants:
        args = dict(
            layer_names=["0"], n_components={"0": 4}, num_samples=2,
            aggregate_fn=aggregate_conv_mean, image_size=IMG,
            model_preprocess=_preprocess, config=FAST,
            cache_dir=str(tmp_path), max_batch=8,
        )
        args.update(kw)
        cv = SynthesisComponentVisualizer(
            toy, args.pop("layer_names"), args.pop("n_components"),
            args.pop("num_samples"), args.pop("aggregate_fn"), **args,
        )
        paths.add(cv._gallery_path("0"))
    assert len(paths) == 1 + len(variants), "every variant must key its own gallery"


def test_wrong_shaped_cached_gallery_triggers_resynthesis(toy, tmp_path, caplog):
    """A stale/foreign file at the digest path (e.g. hand-copied) must be
    shape-validated and re-synthesized, never loaded as wrong evidence."""
    import logging
    import shutil

    cv1 = _make_cv(toy, tmp_path)
    cv1.run()

    cv2 = SynthesisComponentVisualizer(
        toy, ["0"], {"0": 3}, num_samples=2, aggregate_fn=aggregate_conv_mean,
        image_size=IMG, model_preprocess=_preprocess, config=FAST,
        cache_dir=str(tmp_path), max_batch=8,
    )
    path2 = cv2._gallery_path("0")
    path2.parent.mkdir(parents=True, exist_ok=True)
    shutil.copy(cv1._gallery_path("0"), path2)  # wrong shape (4 vs 3 comps)
    with caplog.at_level(logging.WARNING):
        cv2.run()
    assert cv2.gallery["0"].shape == (3, 2, IMG, IMG, 3)
    assert any("re-synthesizing" in r.message for r in caplog.records)
