"""TorchSubjectModel: arbitrary torch modules as subjects (reference's
any-model-via-hooks promise, reference activation_caching.py:266-277)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
from torch import nn  # noqa: E402

from semanticlens_tpu.models import TorchSubjectModel  # noqa: E402


def _small_cnn(seed=0):
    g = torch.Generator().manual_seed(seed)
    model = nn.Sequential(
        nn.Conv2d(3, 8, 3, padding=1),
        nn.ReLU(),
        nn.Conv2d(8, 16, 3, stride=2, padding=1),
        nn.ReLU(),
        nn.AdaptiveAvgPool2d(1),
        nn.Flatten(),
        nn.Linear(16, 5),
    )
    with torch.no_grad():
        for mod in model.modules():
            if isinstance(mod, (nn.Conv2d, nn.Linear)):
                mod.weight.copy_(torch.randn(mod.weight.shape, generator=g) * 0.1)
                mod.bias.copy_(torch.randn(mod.bias.shape, generator=g) * 0.1)
    return model.eval()


@pytest.fixture(scope="module")
def subject():
    return TorchSubjectModel(_small_cnn(), name="torch-cnn")


def test_module_names_are_named_modules(subject):
    assert subject.module_names == tuple(str(i) for i in range(7))
    assert subject.has_module("2")
    assert not subject.has_module("features.0")


def test_apply_matches_torch_and_is_nhwc(subject):
    x = np.random.default_rng(0).normal(size=(2, 16, 16, 3)).astype(np.float32)
    out, taps = subject.apply({}, jnp.asarray(x), ("0", "2"))
    with torch.no_grad():
        want = subject.module(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-5, atol=1e-6)
    assert taps["0"].shape == (2, 16, 16, 8)   # NHWC
    assert taps["2"].shape == (2, 8, 8, 16)    # strided, NHWC
    # tap "0" is the conv output pre-ReLU
    conv0 = subject.module[0]
    with torch.no_grad():
        want0 = conv0(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(taps["0"]), want0, rtol=1e-5, atol=1e-6)


def test_apply_traces_under_jit_and_eval_shape(subject):
    x = jnp.zeros((2, 16, 16, 3), jnp.float32)

    @jax.jit
    def f(x):
        out, taps = subject.apply({}, x, ("2",))
        return out.sum() + taps["2"].sum()

    assert np.isfinite(float(f(x)))
    shapes = jax.eval_shape(lambda x: subject.apply({}, x, ("2",)), x)
    assert shapes[1]["2"].shape == (2, 8, 8, 16)


def test_non_float32_module():
    """fp64/fp16 modules get input in their own parameter dtype; captures
    come back float32."""
    net = _small_cnn(seed=1).double()
    subject = TorchSubjectModel(net, name="torch-cnn-f64")
    x = np.random.default_rng(3).normal(size=(2, 16, 16, 3)).astype(np.float32)
    out, taps = subject.apply({}, jnp.asarray(x), ("2",))
    assert np.asarray(out).dtype == np.float32
    assert taps["2"].dtype == jnp.float32
    with torch.no_grad():
        want = net(torch.from_numpy(x.transpose(0, 3, 1, 2)).double()).float().numpy()
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-5, atol=1e-6)


def test_unreached_module_raises():
    class TwoPath(nn.Module):
        def __init__(self):
            super().__init__()
            self.used = nn.Linear(4, 4)
            self.unused = nn.Linear(4, 4)

        def forward(self, x):
            return self.used(x)

    subject = TorchSubjectModel(TwoPath().eval(), channels_last=False)
    with pytest.raises(KeyError, match="never fired"):
        subject.apply({}, jnp.zeros((2, 4), jnp.float32), ("unused",))


def test_collect_engine_e2e_matches_numpy_topk():
    """Full engine sweep (jit + donated top-k) over a torch subject must equal
    a straight numpy recomputation of the aggregated top-k."""
    from semanticlens_tpu.collect.engine import CollectEngine
    from semanticlens_tpu.data import ArrayDataset
    from semanticlens_tpu.ops.aggregators import aggregate_conv_mean

    subject = TorchSubjectModel(_small_cnn(), name="torch-cnn-e2e")
    images = np.random.default_rng(1).normal(size=(11, 16, 16, 3)).astype(np.float32)
    # tap "3" (post-ReLU): strictly positive means, so no 0.0-sentinel slots
    # (reference quirk: negative activations never displace unfilled slots).
    engine = CollectEngine(subject, ["3"], aggregate_conv_mean, n_collect=4)
    states, n = engine.run({}, ArrayDataset(images, name="t"), batch_size=4)
    assert n == 11
    ids = np.asarray(states["3"].ids)

    with torch.no_grad():
        acts = subject.module[:4](torch.from_numpy(images.transpose(0, 3, 1, 2))).numpy()
    agg = acts.mean(axis=(2, 3))  # (N, 16)
    # Stored values are bf16 (reference parity) — near-ties can pick a
    # different id than float32 argsort, so compare at bf16 resolution.
    import ml_dtypes

    agg16 = agg.astype(ml_dtypes.bfloat16)
    want_vals = -np.sort(-agg16, axis=0, kind="stable")[:4].T  # (16, 4)
    got_vals = np.take_along_axis(agg16.T, ids, axis=1)
    np.testing.assert_array_equal(got_vals, want_vals)
    np.testing.assert_array_equal(
        np.asarray(states["3"].values), want_vals.astype(ml_dtypes.bfloat16)
    )


def test_visualizer_integration(tmp_path):
    """Plugs into ActivationComponentVisualizer with reference-format caching."""
    from semanticlens_tpu.collect import ActivationComponentVisualizer
    from semanticlens_tpu.data import ArrayDataset
    from semanticlens_tpu.ops.aggregators import aggregate_conv_mean

    subject = TorchSubjectModel(_small_cnn(), name="torch-cnn-cv")
    subject.params = {}
    ds = ArrayDataset(
        np.random.default_rng(2).normal(size=(8, 16, 16, 3)).astype(np.float32), name="d"
    )
    cv = ActivationComponentVisualizer(
        model=subject, dataset_model=ds, dataset_fm=ds,
        layer_names=["2"], num_samples=3,
        aggregate_fn=aggregate_conv_mean, cache_dir=tmp_path,
    )
    cache = cv.run(batch_size=4)
    assert cache["2"].activations.shape == (16, 3)
    stored = list(tmp_path.rglob("aggregate_conv_mean-3-2.safetensors"))
    assert stored, "reference-format cache file missing"


def test_relevance_cv_rejects_torch_subjects():
    from semanticlens_tpu.collect import RelevanceComponentVisualizer
    from semanticlens_tpu.data import ArrayDataset

    subject = TorchSubjectModel(_small_cnn(), name="torch-cnn-rej")
    ds = ArrayDataset(np.zeros((2, 16, 16, 3), np.float32), name="d")
    with pytest.raises(TypeError, match="autodiff"):
        RelevanceComponentVisualizer(subject, ds, ["2"], params={})
