"""Score-function tests: shapes, ranges, and closed-form golden values.

Mirrors the reference's test strategy (reference tests/test_scores.py) and
adds numerical parity checks against the closed-form math.
"""

import numpy as np
import pytest

from semanticlens_tpu import scores


@pytest.fixture
def concept_tensor():
    rng = np.random.default_rng(0)
    return rng.normal(size=(10, 20, 128)).astype(np.float32)


@pytest.fixture
def aggregated_concept_tensor():
    rng = np.random.default_rng(1)
    return rng.normal(size=(10, 15, 128)).astype(np.float32)


def test_clarity_score_shape_and_range(concept_tensor):
    clarity = np.asarray(scores.clarity_score(concept_tensor))
    assert clarity.shape == (10,)
    n = concept_tensor.shape[1]
    assert np.all(clarity >= -1.0 / (n - 1) - 1e-5)
    assert np.all(clarity <= 1.0 + 1e-5)


def test_clarity_score_golden():
    # Identical rows → perfect clarity of 1.
    v = np.tile(np.array([[1.0, 2.0, 3.0]], np.float32), (5, 1))[None]
    clarity = np.asarray(scores.clarity_score(v))
    np.testing.assert_allclose(clarity, [1.0], atol=1e-6)

    # Orthogonal pair: mean pairwise cosine (off-diagonal) is 0.
    v = np.array([[[1.0, 0.0], [0.0, 1.0]]], np.float32)
    clarity = np.asarray(scores.clarity_score(v))
    np.testing.assert_allclose(clarity, [0.0], atol=1e-6)

    # Antipodal pair: mean off-diagonal cosine is −1.
    v = np.array([[[1.0, 0.0], [-1.0, 0.0]]], np.float32)
    clarity = np.asarray(scores.clarity_score(v))
    np.testing.assert_allclose(clarity, [-1.0], atol=1e-6)


def test_redundancy_score_shape_and_range(aggregated_concept_tensor):
    redundancy = np.asarray(scores.redundancy_score(aggregated_concept_tensor))
    assert redundancy.shape == (10,)
    assert np.all(redundancy >= -1.0 - 1e-5)
    assert np.all(redundancy <= 1.0 + 1e-5)


def test_redundancy_score_scalar_for_2d():
    rng = np.random.default_rng(2)
    cones = rng.normal(size=(10, 64)).astype(np.float32)
    redundancy = np.asarray(scores.redundancy_score(cones))
    assert redundancy.shape == ()


def test_redundancy_score_golden():
    # Two identical vectors + one orthogonal: rows 0/1 have max off-diag
    # cosine 1, row 2 has 0 → mean = 2/3.
    cones = np.array([[1.0, 0.0], [1.0, 0.0], [0.0, 1.0]], np.float32)
    redundancy = float(scores.redundancy_score(cones))
    np.testing.assert_allclose(redundancy, 2.0 / 3.0, atol=1e-6)


def test_similarity_score_matrix_dispatch():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(5, 32)).astype(np.float32)
    y = rng.normal(size=(3, 32)).astype(np.float32)
    sim = np.asarray(scores.similarity_score(x, y))
    assert sim.shape == (5, 3)
    # Golden: normalized dot products.
    xn = x / np.linalg.norm(x, axis=-1, keepdims=True)
    yn = y / np.linalg.norm(y, axis=-1, keepdims=True)
    np.testing.assert_allclose(sim, xn @ yn.T, atol=1e-5)


def test_similarity_score_elementwise():
    x = np.array([[1.0, 0.0], [0.0, 2.0]], np.float32)
    y = np.array([[2.0, 0.0], [0.0, -1.0]], np.float32)
    sim = np.asarray(scores.similarity_score(x, y))
    np.testing.assert_allclose(sim, [1.0, -1.0], atol=1e-6)


def test_similarity_score_incompatible_raises():
    with pytest.raises(ValueError):
        scores.similarity_score(np.zeros((4, 7), np.float32), np.zeros((3, 9), np.float32))


def test_polysemanticity_score_shape_and_range(concept_tensor):
    poly = np.asarray(scores.polysemanticity_score(concept_tensor[:5, :10]))
    assert poly.shape == (5,)
    assert np.all(poly >= -1e5)


def test_polysemanticity_detects_two_modes():
    # A neuron whose examples form two antipodal clusters should be far more
    # polysemantic than one whose examples form a single tight cluster.
    rng = np.random.default_rng(4)
    tight = rng.normal(size=(1, 20, 16)).astype(np.float32) * 0.01 + np.ones(16, np.float32)
    a = np.ones(16, np.float32)
    b = -np.ones(16, np.float32)
    bimodal = np.concatenate(
        [
            a + 0.01 * rng.normal(size=(10, 16)).astype(np.float32),
            b + 0.01 * rng.normal(size=(10, 16)).astype(np.float32),
        ]
    )[None]
    V = np.concatenate([tight, bimodal], axis=0)
    poly = np.asarray(scores.polysemanticity_score(V))
    assert poly[1] > poly[0] + 0.5
    assert poly[1] > 1.5  # antipodal centers → clarity −1 → poly 2


def _sklearn_reference_poly(V):
    """Reference math (semanticlens/scores.py:164-171) with sklearn KMeans."""
    from sklearn.cluster import KMeans

    centers = np.stack(
        [KMeans(n_clusters=2, n_init=10, random_state=123).fit(v).cluster_centers_ for v in V]
    )
    return 1.0 - np.asarray(scores.clarity_score(centers.astype(np.float32)))


def test_polysemanticity_matches_sklearn_on_structured_data():
    """Tolerance parity vs the reference's sklearn-based implementation.

    Structured (mixture) data — the realistic case for concept embeddings —
    must agree tightly; both implementations find the same two modes.
    """
    pytest.importorskip("sklearn.cluster")
    rng = np.random.default_rng(5)
    neurons = []
    for i in range(6):
        mu_a = rng.normal(size=32).astype(np.float32)
        mu_b = rng.normal(size=32).astype(np.float32)
        pts = np.concatenate(
            [
                mu_a + 0.3 * rng.normal(size=(12, 32)).astype(np.float32),
                mu_b + 0.3 * rng.normal(size=(12, 32)).astype(np.float32),
            ]
        )
        neurons.append(pts)
    V = np.stack(neurons)

    poly = np.asarray(scores.polysemanticity_score(V))
    ref_poly = _sklearn_reference_poly(V)
    np.testing.assert_allclose(poly, ref_poly, atol=0.02)


def test_polysemanticity_close_to_sklearn_on_noise():
    """Pure-noise inputs have many near-equal k-means minima; parity is loose
    by nature (SURVEY.md §5: tolerance-based, not bit-exact)."""
    pytest.importorskip("sklearn.cluster")
    rng = np.random.default_rng(5)
    V = rng.normal(size=(6, 24, 32)).astype(np.float32)
    poly = np.asarray(scores.polysemanticity_score(V))
    ref_poly = _sklearn_reference_poly(V)
    np.testing.assert_allclose(poly, ref_poly, atol=0.15)


def test_cosine_probe_square_db_unambiguous():
    """Regression: probing a DB whose component count equals the embedding
    dim must compute queries @ db.T (the reference's similarity_score
    dispatch silently computes the wrong product in this case)."""
    rng = np.random.default_rng(9)
    q = rng.normal(size=(3, 8)).astype(np.float32)
    db = rng.normal(size=(8, 8)).astype(np.float32)  # C == D

    out = np.asarray(scores.cosine_probe(q, db))
    qn = q / np.linalg.norm(q, axis=-1, keepdims=True)
    dn = db / np.linalg.norm(db, axis=-1, keepdims=True)
    np.testing.assert_allclose(out, qn @ dn.T, atol=1e-5)

    # Lens._probe must route through cosine_probe.
    from semanticlens_tpu.lens import _probe

    np.testing.assert_allclose(_probe(q, db), qn @ dn.T, atol=1e-5)


def test_cosine_probe_dim_mismatch_raises():
    with pytest.raises(ValueError):
        scores.cosine_probe(np.zeros((2, 8), np.float32), np.zeros((4, 6), np.float32))


def test_topk_cosine_search_matches_dense():
    from semanticlens_tpu.scores import topk_cosine_search

    rng = np.random.default_rng(0)
    q = rng.normal(size=(7, 32)).astype(np.float32)
    comp = rng.normal(size=(1000, 32)).astype(np.float32)

    vals, idx = topk_cosine_search(q, comp, k=9, chunk_size=128)  # ragged last chunk
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    cn = comp / np.linalg.norm(comp, axis=1, keepdims=True)
    dense = qn @ cn.T
    want_idx = np.argsort(-dense, axis=1)[:, :9]
    want_vals = np.take_along_axis(dense, want_idx, axis=1)
    np.testing.assert_allclose(np.asarray(vals), want_vals, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(idx), want_idx)


def test_topk_cosine_search_single_chunk_and_validation():
    import pytest as _pytest

    from semanticlens_tpu.scores import topk_cosine_search

    rng = np.random.default_rng(1)
    q = rng.normal(size=(2, 8)).astype(np.float32)
    comp = rng.normal(size=(5, 8)).astype(np.float32)
    vals, idx = topk_cosine_search(q, comp, k=5, chunk_size=4096)
    assert vals.shape == (2, 5) and sorted(np.asarray(idx)[0].tolist()) == [0, 1, 2, 3, 4]
    with _pytest.raises(ValueError):
        topk_cosine_search(q, comp, k=6)


def test_class_composition_counts_and_purity():
    from semanticlens_tpu.scores import class_composition

    labels = np.asarray([0, 0, 1, 1, 2, 2])
    ids = np.asarray(
        [
            [0, 1, -1],   # pure class 0 (one sentinel)
            [2, 4, 5],    # 1x class1, 2x class2
            [-1, -1, -1], # dead component
        ]
    )
    counts, purity = class_composition(ids, labels)
    np.testing.assert_array_equal(counts, [[2, 0, 0], [0, 1, 2], [0, 0, 0]])
    np.testing.assert_allclose(purity, [1.0, 2 / 3, 0.0], rtol=1e-6)
    # explicit width pads unseen classes
    counts5, _ = class_composition(ids, labels, n_classes=5)
    assert counts5.shape == (3, 5) and counts5[:, 3:].sum() == 0


def test_class_composition_from_collect_sweep():
    """End-to-end: engine top-k ids + dataset labels → sensible histograms."""
    import jax
    import jax.numpy as jnp

    from semanticlens_tpu.collect.engine import CollectEngine
    from semanticlens_tpu.data import ArrayDataset
    from semanticlens_tpu.models import ResNet
    from semanticlens_tpu.ops.aggregators import aggregate_conv_mean
    from semanticlens_tpu.scores import class_composition

    model = ResNet(depth=18, num_classes=10, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    images = rng.random((20, 32, 32, 3)).astype(np.float32)
    labels = rng.integers(0, 4, size=20)
    engine = CollectEngine(
        model=model, layer_names=("layer4",), aggregation_fn=aggregate_conv_mean, n_collect=4
    )
    states, n = engine.run(params, ArrayDataset(images, name="cc"), 5)
    counts, purity = class_composition(np.asarray(states["layer4"].ids), labels, n_classes=4)
    assert counts.shape == (512, 4)
    # every live component's evidence count is at most k and matches valid slots
    valid = (np.asarray(states["layer4"].ids) >= 0).sum(axis=1)
    np.testing.assert_array_equal(counts.sum(axis=1), valid)
    assert ((purity >= 0) & (purity <= 1)).all()


def test_fastcav_closed_form():
    """FastCAV = unit mean-difference; separates a planted concept direction
    that a raw mean-image probe confounds with shared style."""
    from semanticlens_tpu.scores import fastcav

    rng = np.random.default_rng(0)
    d = 32
    concept = np.zeros(d); concept[0] = 1.0
    style = np.zeros(d); style[1] = 1.0  # shared by BOTH sets (e.g. photo stats)
    pos = concept + style + rng.normal(0, 0.05, (20, d))
    neg = style + rng.normal(0, 0.05, (20, d))
    cav = np.asarray(fastcav(pos, neg))
    np.testing.assert_allclose(np.linalg.norm(cav), 1.0, rtol=1e-5)
    assert cav[0] > 0.99          # points at the concept
    assert abs(cav[1]) < 0.1      # the shared style direction is subtracted
    # raw positive mean does NOT cancel style
    raw = pos.mean(0) / np.linalg.norm(pos.mean(0))
    assert abs(raw[1]) > 0.5


# ------------------------------------------------------------------- drift
def test_drift_score_identical_and_flipped():
    from semanticlens_tpu.scores import drift_score

    rng = np.random.default_rng(11)
    db = rng.normal(size=(6, 4, 16)).astype(np.float32)
    drift = np.asarray(drift_score(db, db))
    np.testing.assert_allclose(drift, 0.0, atol=1e-6)
    flipped = np.asarray(drift_score(db, -db))
    np.testing.assert_allclose(flipped, 2.0, atol=1e-6)


def test_drift_score_orthogonal_and_aggregated_input():
    from semanticlens_tpu.scores import drift_score

    a = np.zeros((3, 8), np.float32)
    b = np.zeros((3, 8), np.float32)
    a[:, 0] = 1.0
    b[:, 1] = 1.0
    np.testing.assert_allclose(np.asarray(drift_score(a, b)), 1.0, atol=1e-6)
    # (C, k, D) vs (C, D) mix is fine — both aggregate to (C, D).
    a3 = np.repeat(a[:, None, :], 5, axis=1)
    np.testing.assert_allclose(np.asarray(drift_score(a3, a)), 0.0, atol=1e-6)


def test_drift_score_validates_shapes():
    from semanticlens_tpu.scores import drift_score

    with pytest.raises(ValueError):
        drift_score(np.zeros((3, 4, 8), np.float32), np.zeros((4, 4, 8), np.float32))
    with pytest.raises(ValueError):
        drift_score(np.zeros((8,), np.float32), np.zeros((8,), np.float32))


def test_match_components_and_coverage_permutation():
    from semanticlens_tpu.scores import match_components, semantic_coverage

    rng = np.random.default_rng(12)
    a = rng.normal(size=(10, 32)).astype(np.float32)
    perm = rng.permutation(10)
    b = a[perm]
    idx, cos = match_components(a, b)
    # every component of A finds its permuted copy at cosine 1
    np.testing.assert_array_equal(np.asarray(idx), np.argsort(perm))
    np.testing.assert_allclose(np.asarray(cos), 1.0, atol=1e-5)
    assert semantic_coverage(a, b, threshold=0.99) == 1.0
    # dropping half of B's components halves coverage at a strict threshold
    assert semantic_coverage(a, b[:5], threshold=0.99) == pytest.approx(0.5)


def test_match_components_dim_mismatch():
    from semanticlens_tpu.scores import match_components

    with pytest.raises(ValueError):
        match_components(np.zeros((3, 8), np.float32), np.zeros((3, 16), np.float32))


def test_dead_components_are_nan_not_max_drift():
    """All-zero sentinel concept rows (dead SAE latents / never-firing
    units) must NOT read as drift=1 or as lost concepts — they carry no
    evidence at all. drift → NaN; match → (-1, NaN); coverage excludes
    them from the denominator and never matches INTO a dead B row."""
    from semanticlens_tpu.scores import drift_score, match_components, semantic_coverage

    rng = np.random.default_rng(13)
    a = rng.normal(size=(6, 16)).astype(np.float32)
    b = a.copy()
    a[2] = 0.0  # dead in A only
    b[4] = 0.0  # dead in B only
    a[5] = b[5] = 0.0  # dead in both

    drift = np.asarray(drift_score(a, b))
    assert np.isnan(drift[[2, 4, 5]]).all()
    np.testing.assert_allclose(drift[[0, 1, 3]], 0.0, atol=1e-6)

    idx, cos = match_components(a, b)
    idx, cos = np.asarray(idx), np.asarray(cos)
    assert idx[2] == -1 and idx[5] == -1
    assert np.isnan(cos[[2, 5]]).all()
    assert 4 not in idx[[0, 1, 3]]  # dead B row can't win a match
    np.testing.assert_allclose(cos[[0, 1, 3]], 1.0, atol=1e-5)

    # 4 live components of A; 3 survive (a[4] is live but b[4] died).
    assert semantic_coverage(a, b, threshold=0.99) == pytest.approx(3 / 4)
    assert np.isnan(semantic_coverage(np.zeros((3, 16), np.float32), b))


def test_diff_models_cli(tmp_path):
    """tools/diff_models.py end-to-end on Lens-format concept-DB artifacts."""
    import json
    import subprocess
    import sys
    from pathlib import Path

    from safetensors.numpy import save_file

    rng = np.random.default_rng(13)
    base = rng.normal(size=(6, 4, 16)).astype(np.float32)
    drifted = base.copy()
    drifted[2] = rng.normal(size=(4, 16))
    save_file({"features.2": base}, str(tmp_path / "a.safetensors"))
    save_file({"features.2": drifted, "features.9": base}, str(tmp_path / "b.safetensors"))

    tool = Path(__file__).resolve().parent.parent / "tools" / "diff_models.py"
    out = subprocess.run(
        [sys.executable, str(tool), str(tmp_path / "a.safetensors"),
         str(tmp_path / "b.safetensors"), "--top", "1"],
        capture_output=True, text=True, timeout=300, check=True,
    )
    lines = [json.loads(line) for line in out.stdout.strip().splitlines()]
    assert lines[0]["warning"] == "unshared layers skipped"
    assert lines[0]["only_b"] == ["features.9"]
    assert lines[1]["layer"] == "features.2" and lines[1]["components"] == 6
    assert lines[-1]["top_drifted"][0]["component"] == 2

    cov = subprocess.run(
        [sys.executable, str(tool), str(tmp_path / "a.safetensors"),
         str(tmp_path / "b.safetensors"), "--coverage", "--threshold", "0.99"],
        capture_output=True, text=True, timeout=300, check=True,
    )
    cov_lines = [json.loads(line) for line in cov.stdout.strip().splitlines()]
    assert cov_lines[1]["coverage"] == pytest.approx(5 / 6, abs=1e-4)


def test_null_calibrated_polysemanticity():
    """NPI separates coherent from mixed components and NaNs dead rows;
    random-evidence components score ~0 by construction."""
    import jax

    from semanticlens_tpu.scores import null_calibrated_polysemanticity

    rng = np.random.default_rng(0)
    n, d, k = 400, 16, 8
    table = rng.normal(size=(n, d)).astype(np.float32)
    table /= np.linalg.norm(table, axis=1, keepdims=True)

    anchor = table[0]
    coherent = anchor[None] + 0.05 * rng.normal(size=(k, d)).astype(np.float32)
    mixed = np.concatenate([  # two far-apart clusters
        anchor[None] + 0.05 * rng.normal(size=(k // 2, d)).astype(np.float32),
        -anchor[None] + 0.05 * rng.normal(size=(k - k // 2, d)).astype(np.float32),
    ])
    random_ev = table[rng.choice(n, size=k, replace=False)]
    dead = np.zeros((k, d), np.float32)
    V = np.stack([coherent, mixed, random_ev, dead])

    npi, poly, mu, sd = null_calibrated_polysemanticity(V, table, n_null=48, seed=1)
    assert np.isnan(npi[3]) and not np.isnan(npi[:3]).any()
    assert npi[0] < -2.0, f"coherent component not below the null ({npi[0]:.2f})"
    assert npi[1] > npi[0] + 2.0, "mixed component not separated from coherent"
    assert abs(npi[2]) < 3.0, f"random evidence should sit near the null ({npi[2]:.2f})"
    assert 0.0 < mu < 2.0 and sd > 0.0  # poly in [0, 2]: clarity of 2 centers can go negative

    with pytest.raises(ValueError, match="matching D"):
        null_calibrated_polysemanticity(V[:, :, :8], table)
    with pytest.raises(ValueError, match="rows <"):
        null_calibrated_polysemanticity(V, table[: k - 1])
