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
