"""Cross-implementation end-to-end parity vs the actual reference code.

Runs the REFERENCE torch pipeline (mounted read-only at /root/reference) and
this framework on identical data and identical weights, then compares:

- the ActMax cache files (filenames, dtypes, top-k sample ids, bf16 values);
- the concept databases produced by ``Lens.compute_concept_db`` with a
  deterministic shared fake foundation model;
- text-probing scores.

torchvision is not installed, so the reference's utils.helper import is
satisfied with a minimal stub (the compared code paths never call it).
"""

import importlib.util
import sys
import types
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REFERENCE = Path("/root/reference/semanticlens")


# --------------------------------------------------------------------------- #
# Load the reference package with a torchvision stub
# --------------------------------------------------------------------------- #
@pytest.fixture(scope="module")
def reference():
    if not REFERENCE.is_dir():
        pytest.skip("reference checkout not available")

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.transforms = types.ModuleType("torchvision.transforms")
        tv.transforms._presets = types.ModuleType("torchvision.transforms._presets")
        tv.transforms._presets.ImageClassification = type("ImageClassification", (), {})
        tv.transforms.Compose = lambda ts: ts
        tv.transforms.Resize = lambda *a, **k: None
        tv.transforms.CenterCrop = lambda *a, **k: None
        tv.transforms.PILToTensor = lambda: None
        tv.transforms.ConvertImageDtype = lambda *a: None
        tv.transforms.Normalize = lambda *a, **k: None
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tv.transforms
        sys.modules["torchvision.transforms._presets"] = tv.transforms._presets

    # The reference package __init__ imports foundation_models → open_clip is
    # absent, so assemble the needed submodules manually.
    pkg = types.ModuleType("refsl")
    pkg.__path__ = [str(REFERENCE)]
    sys.modules["refsl"] = pkg
    modules = {}
    for name, path in [
        ("refsl.utils", REFERENCE / "utils" / "__init__.py"),
        ("refsl.component_visualization.aggregators", REFERENCE / "component_visualization" / "aggregators.py"),
        ("refsl.component_visualization.activation_caching", REFERENCE / "component_visualization" / "activation_caching.py"),
        ("refsl.scores", REFERENCE / "scores.py"),
    ]:
        if name == "refsl.utils":
            sub = types.ModuleType(name)
            sub.__path__ = [str(REFERENCE / "utils")]
            sys.modules[name] = sub
            continue
        if name == "refsl.component_visualization.aggregators":
            cvpkg = types.ModuleType("refsl.component_visualization")
            cvpkg.__path__ = [str(REFERENCE / "component_visualization")]
            sys.modules["refsl.component_visualization"] = cvpkg
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        modules[name] = mod
    return modules


@pytest.fixture(scope="module")
def shared_setup():
    """Identical weights/data for both implementations."""
    rng = np.random.default_rng(42)
    w1 = rng.normal(size=(8, 3, 3, 3)).astype(np.float32) * 0.3  # torch OIHW
    w2 = rng.normal(size=(16, 8, 3, 3)).astype(np.float32) * 0.3
    images = rng.normal(size=(40, 12, 12, 3)).astype(np.float32)  # HWC
    proj = rng.normal(size=(3, 24)).astype(np.float32)  # fake FM projection
    return w1, w2, images, proj


def _run_reference(reference, shared, storage_dir):
    """Reference hot loop: hooks + ActMaxCache over a 2-conv torch model."""
    w1, w2, images, _ = shared
    RefCache = reference["refsl.component_visualization.activation_caching"].ActMaxCache
    agg = reference["refsl.component_visualization.aggregators"].aggregate_conv_mean

    model = torch.nn.Sequential(
        torch.nn.Conv2d(3, 8, 3, bias=False),
        torch.nn.ReLU(),
        torch.nn.Conv2d(8, 16, 3, bias=False),
    )
    with torch.no_grad():
        model[0].weight.copy_(torch.from_numpy(w1))
        model[2].weight.copy_(torch.from_numpy(w2))
    model.eval()

    cache = RefCache(layer_names=["0", "2"], aggregation_fn=agg, n_collect=5)
    x = torch.from_numpy(images.transpose(0, 3, 1, 2))
    with cache.hook_context(model), torch.no_grad():
        for start in range(0, len(images), 16):
            model(x[start : start + 16])
    cache.store(storage_dir)
    return cache


def _run_ours(shared, storage_dir):
    import jax.numpy as jnp

    from semanticlens_tpu.collect import ActMaxCache as OurCache
    from semanticlens_tpu.collect.engine import CollectEngine
    from semanticlens_tpu.data import ArrayDataset
    from semanticlens_tpu.models.base import SubjectModel, TapCollector
    from semanticlens_tpu.models.layers import conv2d
    from semanticlens_tpu.ops.aggregators import aggregate_conv_mean

    w1, w2, images, _ = shared

    class TwoConv(SubjectModel):
        module_names = ("0", "1", "2")

        def apply(self, params, x, tap_names=()):
            tap = TapCollector(tap_names)
            x = tap("0", conv2d(x, params["0"], padding=0))
            x = tap("1", jax.nn.relu(x))
            x = tap("2", conv2d(x, params["2"], padding=0))
            return x, tap.taps

    import jax

    model = TwoConv()
    params = {
        "0": jnp.asarray(w1.transpose(2, 3, 1, 0)),  # OIHW → HWIO
        "2": jnp.asarray(w2.transpose(2, 3, 1, 0)),
    }
    engine = CollectEngine(
        model=model, layer_names=("0", "2"), aggregation_fn=aggregate_conv_mean, n_collect=5
    )
    states, n = engine.run(params, ArrayDataset(images, name="p"), 16)

    cache = OurCache(["0", "2"], aggregation_fn=aggregate_conv_mean, n_collect=5)
    for name, state in states.items():
        cache[name].n_latents = int(state.values.shape[0])
        cache[name].state = state
        cache.sample_idx_counter[name] = n
    cache.store(storage_dir)
    return cache


def test_e2e_collect_parity(reference, shared_setup, tmp_path):
    """Same weights + data → identical cache files from both implementations."""
    ref_dir = tmp_path / "ref"
    our_dir = tmp_path / "ours"
    _run_reference(reference, shared_setup, ref_dir)
    _run_ours(shared_setup, our_dir)

    ref_files = sorted(f.name for f in ref_dir.iterdir())
    our_files = sorted(f.name for f in our_dir.iterdir())
    assert ref_files == our_files == [
        "aggregate_conv_mean-5-0.safetensors",
        "aggregate_conv_mean-5-2.safetensors",
    ]

    from safetensors.numpy import load_file

    for fname in ref_files:
        ref_t = load_file(str(ref_dir / fname))
        our_t = load_file(str(our_dir / fname))
        # Selected concept examples: near-identical. Cross-framework conv
        # rounding can swap neighbors at bf16 ties in the top-k tail, so a
        # small id disagreement is inherent; require ≥95% exact agreement.
        agreement = (ref_t["sample_ids"] == our_t["sample_ids"]).mean()
        assert agreement >= 0.95, f"{fname}: only {agreement:.1%} id agreement"
        # bf16 activations: numerically equal up to cross-framework conv
        # accumulation-order noise (different f32 results round to adjacent
        # bf16 codes); dtypes and shapes are identical by format.
        assert ref_t["activations"].dtype == our_t["activations"].dtype
        rv = ref_t["activations"].astype(np.float32)
        ov = our_t["activations"].astype(np.float32)
        np.testing.assert_allclose(ov, rv, rtol=2e-2, atol=1e-3)
        same = (ref_t["activations"].view(np.uint16) == our_t["activations"].view(np.uint16)).mean()
        assert same > 0.5, f"only {same:.1%} bit-identical"


def test_e2e_score_parity(reference, shared_setup):
    """Reference torch scores == our jitted scores on the same concept DB."""
    ref_scores = reference["refsl.scores"]
    from semanticlens_tpu import scores as our_scores

    rng = np.random.default_rng(7)
    V = rng.normal(size=(12, 9, 32)).astype(np.float32)

    ref_clarity = ref_scores.clarity_score(torch.from_numpy(V)).numpy()
    np.testing.assert_allclose(np.asarray(our_scores.clarity_score(V)), ref_clarity, atol=1e-5)

    agg = V.mean(1)
    ref_red = ref_scores.redundancy_score(torch.from_numpy(agg)).numpy()
    np.testing.assert_allclose(np.asarray(our_scores.redundancy_score(agg)), ref_red, atol=1e-5)

    q = rng.normal(size=(3, 32)).astype(np.float32)
    ref_sim = ref_scores.similarity_score(torch.from_numpy(q), torch.from_numpy(agg)).numpy()
    np.testing.assert_allclose(np.asarray(our_scores.similarity_score(q, agg)), ref_sim, atol=1e-5)

    # Polysemanticity on STRUCTURED data (two modes per neuron): both k-means
    # implementations must find the same clustering. Pure noise with few
    # samples has many near-equal minima and is excluded by design
    # (SURVEY.md §5: tolerance parity).
    mixtures = []
    for i in range(8):
        mu_a = rng.normal(size=32).astype(np.float32)
        mu_b = rng.normal(size=32).astype(np.float32)
        mixtures.append(
            np.concatenate(
                [
                    mu_a + 0.25 * rng.normal(size=(10, 32)).astype(np.float32),
                    mu_b + 0.25 * rng.normal(size=(10, 32)).astype(np.float32),
                ]
            )
        )
    Vm = np.stack(mixtures)
    ref_poly = ref_scores.polysemanticity_score(torch.from_numpy(Vm)).numpy()
    ours_poly = np.asarray(our_scores.polysemanticity_score(Vm))
    np.testing.assert_allclose(ours_poly, ref_poly, atol=0.03)


import jax  # noqa: E402  (used inside _run_ours)


# --------------------------------------------------------------------------- #
# Tier-2 cache (concept DB) + text probing parity against the reference Lens
# --------------------------------------------------------------------------- #
@pytest.fixture(scope="module")
def ref_lens(reference):
    """Load the reference's lens.py under its canonical package name.

    Bare parent packages skip the heavyweight __init__ imports (open_clip,
    crp); leaf modules load normally so `semanticlens.lens` resolves its
    absolute imports.
    """
    import importlib.util as ilu

    for pkg_name, sub in [
        ("semanticlens", ""),
        ("semanticlens.component_visualization", "component_visualization"),
        ("semanticlens.utils", "utils"),
        ("semanticlens.foundation_models", "foundation_models"),
    ]:
        if pkg_name not in sys.modules:
            mod = types.ModuleType(pkg_name)
            mod.__path__ = [str(REFERENCE / sub) if sub else str(REFERENCE)]
            sys.modules[pkg_name] = mod
    for name, rel in [
        ("semanticlens.utils.helper", "utils/helper.py"),
        ("semanticlens.utils.log_setup", "utils/log_setup.py"),
        ("semanticlens.component_visualization.base", "component_visualization/base.py"),
        ("semanticlens.foundation_models.base", "foundation_models/base.py"),
        ("semanticlens.scores", "scores.py"),
        ("semanticlens.lens", "lens.py"),
    ]:
        if name in sys.modules:
            continue
        spec = ilu.spec_from_file_location(name, REFERENCE / rel)
        mod = ilu.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
    return sys.modules["semanticlens.lens"]


class _SharedFakeFM:
    """Deterministic FM both implementations can host (torch / numpy views)."""

    name = "shared-fake-fm"
    device = "cpu"  # the reference moves tokens to fm.device (lens.py:188)

    def to(self, device):  # reference Lens ctor calls fm.to (lens.py:272)
        return self

    def __init__(self, dim=24, backend="numpy"):
        self.dim = dim
        self.backend = backend
        self._table = np.random.default_rng(9).normal(size=(512, dim)).astype(np.float32)

    def tokenize(self, txt):
        txts = txt if isinstance(txt, list) else [txt]
        ids = np.asarray(
            [[sum(ord(c) for c in t) % 512] for t in txts], np.int64
        )
        return torch.from_numpy(ids) if self.backend == "torch" else ids

    def encode_text(self, tokens):
        tok = tokens.numpy() if hasattr(tokens, "numpy") else np.asarray(tokens)
        rows = self._table[tok[:, 0]]
        return torch.from_numpy(rows) if self.backend == "torch" else rows


def _fake_cv(kind, storage_dir, db):
    """Minimal CV seam carrying the cache contract both Lenses consume."""
    meta = {
        "aggregation_fn_name": "aggregate_conv_mean",
        "n_collect": "5",
        "layer_names": "['layer4']",
        "dataset": "ds",
        "model": "m",
    }
    sd = Path(storage_dir)
    if kind == "torch":

        class CV:
            caching = True
            storage_dir = sd
            metadata = meta

            def _compute_concept_db(self, fm, **kw):
                return {k: torch.from_numpy(v.copy()) for k, v in db.items()}

        return CV()

    class CV2:
        caching = True
        storage_dir = sd
        metadata = meta

        def _compute_concept_db(self, fm, **kw):
            return {k: v.copy() for k, v in db.items()}

    return CV2()


def test_concept_db_cache_cross_implementation(ref_lens, tmp_path):
    """Reference-written tier-2 cache is a cache HIT for our Lens, and vice versa."""
    from semanticlens_tpu.lens import Lens as OurLens

    rng = np.random.default_rng(3)
    db = {"layer4": rng.normal(size=(6, 5, 24)).astype(np.float32)}

    # reference writes...
    ref_fm = _SharedFakeFM(backend="torch")
    ref_lens_obj = ref_lens.Lens(ref_fm)
    ref_out = ref_lens_obj.compute_concept_db(_fake_cv("torch", tmp_path, db))
    ref_files = list((tmp_path / "concept_database" / "shared-fake-fm").iterdir())
    assert [f.name for f in ref_files] == [
        "concept_db-aggregate_conv_mean-5-['layer4'].safetensors"
    ]

    # ...our Lens must hit that exact cache, not recompute
    our_lens = OurLens(_SharedFakeFM(backend="numpy"))
    poisoned = {"layer4": np.zeros_like(db["layer4"])}  # recompute would differ
    out = our_lens.compute_concept_db(_fake_cv("numpy", tmp_path, poisoned))
    np.testing.assert_allclose(np.asarray(out["layer4"]), db["layer4"], rtol=1e-6)
    np.testing.assert_allclose(ref_out["layer4"].numpy(), db["layer4"], rtol=1e-6)

    # and the reverse: our write is the reference's cache hit
    tmp2 = tmp_path / "rev"
    out2 = our_lens.compute_concept_db(_fake_cv("numpy", tmp2, db))
    ref_out2 = ref_lens.Lens(ref_fm).compute_concept_db(_fake_cv("torch", tmp2, poisoned))
    np.testing.assert_allclose(ref_out2["layer4"].numpy(), np.asarray(out2["layer4"]), rtol=1e-6)


def test_text_probing_scores_match_reference(ref_lens):
    """Same fake FM + agg DB → identical probing scores incl. template bias."""
    from semanticlens_tpu.lens import text_probing as our_text_probing

    rng = np.random.default_rng(4)
    agg = rng.normal(size=(10, 24)).astype(np.float32)
    queries = ["dog", "car wheel"]
    templates = ["a photo of a {}", "art of the {}"]

    ref_scores = ref_lens.text_probing(
        _SharedFakeFM(backend="torch"),
        queries,
        {"layer4": torch.from_numpy(agg.copy())},
        templates=templates,
    )["layer4"].numpy()
    our_scores = our_text_probing(
        _SharedFakeFM(backend="numpy"), queries, {"layer4": agg}, templates=templates
    )["layer4"]
    np.testing.assert_allclose(our_scores, ref_scores, rtol=1e-5, atol=1e-6)

    # no-template path too
    r = ref_lens.text_probing(
        _SharedFakeFM(backend="torch"), "dog", {"l": torch.from_numpy(agg.copy())}
    )["l"].numpy()
    o = our_text_probing(_SharedFakeFM(backend="numpy"), "dog", {"l": agg})["l"]
    np.testing.assert_allclose(o, r, rtol=1e-5, atol=1e-6)
