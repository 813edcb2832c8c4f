"""SAE component visualizer: end-to-end Collect/Embed over SAE latents.

The SAE flows through the standard machinery (engine, caches, concept DB) —
these tests mirror test_activation_based.py's structure with the virtual
``"{layer}.sae"`` tap.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).parent))
from test_activation_based import FakeVLM, TinyConvNet  # noqa: E402

from semanticlens_tpu.collect import SAEComponentVisualizer
from semanticlens_tpu.data import ArrayDataset
from semanticlens_tpu.sae import SAEConfig, SAESubjectModel, encode, init_sae


N_LATENTS = 16
K = 2


@pytest.fixture(scope="module")
def sae_setup():
    model = TinyConvNet()
    model.params = model.init(jax.random.PRNGKey(0))
    model.name = "tiny-convnet"
    rng = np.random.default_rng(0)
    images = rng.normal(size=(50, 16, 16, 3)).astype(np.float32)
    ds = ArrayDataset(images, name="tiny-ds")
    cfg = SAEConfig(d_in=8, n_latents=N_LATENTS, k=K)
    sae_params = init_sae(jax.random.PRNGKey(1), cfg)
    return model, ds, sae_params


def _make_cv(model, ds, sae_params, tmp_path=None, **kw):
    return SAEComponentVisualizer(
        model=model,
        dataset_model=ds,
        dataset_fm=ds,
        layer_name="1",
        sae_params=sae_params,
        num_samples=5,
        k=K,
        cache_dir=str(tmp_path) if tmp_path else None,
        **kw,
    )


def test_run_collects_topk_over_latents(sae_setup):
    model, ds, sae_params = sae_setup
    cv = _make_cv(model, ds, sae_params)
    cache = cv.run(batch_size=16)
    assert cv.layer_names == ["1.sae"]
    act = cache["1.sae"]
    assert act.activations.shape == (N_LATENTS, 5)
    assert act.sample_ids.max() < 50
    vals = act.activations.astype(np.float32)
    assert (np.diff(vals, axis=1) <= 1e-6).all()  # sorted descending
    assert (vals >= 0).all()  # codes are ReLU-clamped


def test_matches_bruteforce_sae_codes(sae_setup):
    """Streamed top-k over the virtual tap == brute-force encode of every
    position, max-aggregated per image."""
    model, ds, sae_params = sae_setup
    cv = _make_cv(model, ds, sae_params)
    cache = cv.run(batch_size=16)

    _, taps = model.apply(model.params, jnp.asarray(ds.images), tap_names=("1",))
    codes = encode(sae_params, taps["1"], k=K)  # (N, H, W, F)
    per_image = np.asarray(jnp.max(codes, axis=(1, 2)))  # aggregate_max_auto

    import ml_dtypes

    agg_bf = per_image.T.astype(ml_dtypes.bfloat16).astype(np.float32)  # (F, N)
    top_vals = -np.sort(-agg_bf, axis=1)[:, :5]
    got = cache["1.sae"].activations.astype(np.float32)
    # Dead latents (all-zero rows) keep the 0.0-init sentinel slots.
    np.testing.assert_allclose(got, np.maximum(top_vals, 0.0), atol=1e-6)


def test_concept_db_and_sentinels(sae_setup):
    model, ds, sae_params = sae_setup
    cv = _make_cv(model, ds, sae_params)
    fm = FakeVLM()
    db = cv._compute_concept_db(fm, batch_size=16)
    assert db["1.sae"].shape == (N_LATENTS, 5, fm.embed_dim)
    ids = cv.get_max_reference("1.sae")
    assert ids.shape == (N_LATENTS, 5)
    # Sentinel slots (latents with < 5 firing images) must be zero rows.
    assert (db["1.sae"][ids < 0] == 0).all()
    if (ids >= 0).any():
        assert np.abs(db["1.sae"][ids >= 0]).sum() > 0


def test_cache_roundtrip(sae_setup, tmp_path):
    model, ds, sae_params = sae_setup
    cv = _make_cv(model, ds, sae_params, tmp_path)
    assert "SAEComponentVisualizer" in str(cv.storage_dir)
    c1 = cv.run(batch_size=16)
    cv2 = _make_cv(model, ds, sae_params, tmp_path)
    c2 = cv2.run(batch_size=16)  # must load, not recompute
    np.testing.assert_array_equal(
        c1["1.sae"].sample_ids, c2["1.sae"].sample_ids
    )


def test_cache_identity_follows_dictionary(sae_setup, tmp_path):
    """A different trained dictionary must NOT hit the old cache."""
    model, ds, sae_params = sae_setup
    cv = _make_cv(model, ds, sae_params, tmp_path)
    cfg = SAEConfig(d_in=8, n_latents=N_LATENTS, k=K)
    other = init_sae(jax.random.PRNGKey(99), cfg)
    cv_other = _make_cv(model, ds, other, tmp_path)
    assert cv.storage_dir != cv_other.storage_dir


def test_train_staticmethod_smoke(sae_setup):
    model, ds, _ = sae_setup
    cfg = SAEConfig(
        d_in=8, n_latents=N_LATENTS, k=K, lr=2e-3, batch_rows=128, seed=0,
        positions_per_image=8,
    )
    sae_params = SAEComponentVisualizer.train(
        model, ds, "1", cfg, batch_size=16, epochs=2
    )
    assert sae_params["W_dec"].shape == (N_LATENTS, 8)
    cv = _make_cv(model, ds, sae_params)
    cache = cv.run(batch_size=16)
    assert np.isfinite(cache["1.sae"].activations.astype(np.float32)).all()


def test_subject_model_wrapper(sae_setup):
    model, ds, sae_params = sae_setup
    wrapped = SAESubjectModel(model, "1", sae_params, k=K)
    assert wrapped.sae_tap == "1.sae"
    assert set(model.module_names) < set(wrapped.module_names)
    x = jnp.asarray(ds.images[:4])
    out, taps = wrapped.apply(wrapped.params, x, ("1", "1.sae"))
    assert taps["1"].shape[-1] == 8
    assert taps["1.sae"].shape == taps["1"].shape[:-1] + (N_LATENTS,)
    assert (np.asarray(taps["1.sae"]) >= 0).all()
    # Per row, at most k nonzero codes.
    nz = (np.asarray(taps["1.sae"]) > 0).sum(axis=-1)
    assert nz.max() <= K
    # Base-only taps still work; internal tap is not leaked when unrequested.
    _, taps2 = wrapped.apply(wrapped.params, x, ("1.sae",))
    assert set(taps2) == {"1.sae"}
    with pytest.raises(ValueError, match="not found"):
        SAESubjectModel(model, "nope", sae_params, k=K)


def test_ctor_requires_weights(sae_setup):
    """A paramless functional model must fail loudly at construction, not
    with an AttributeError deep in the base-class wiring (found by driving
    a fresh ResNet on the chip)."""
    _, ds, sae_params = sae_setup
    bare = TinyConvNet()  # no .params attached
    with pytest.raises(ValueError, match="weights required"):
        _make_cv(bare, ds, sae_params)
