"""Causal interventions: ablation, patching, steering — ground-truth tests.

A crafted linear model makes every intervention analytically checkable;
a ResNet-18 smoke run proves the tap-contract plumbing reaches a real
family with zero per-model code.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semanticlens_tpu import causal
from semanticlens_tpu.models.base import SubjectModel, TapCollector, interventions


class LinearTapModel(SubjectModel):
    """y = sum over channels of (W @ x)[..., c] * coef[c] — each hidden
    channel's causal contribution to each logit is known in closed form."""

    module_names = ("hidden", "head")

    def __init__(self, d_in=6, d_hidden=4, d_out=3):
        self.shape = (d_in, d_hidden, d_out)

    def init(self, rng):
        k1, k2 = jax.random.split(rng)
        d_in, d_h, d_out = self.shape
        return {
            "w1": jax.random.normal(k1, (d_in, d_h), jnp.float32),
            "w2": jax.random.normal(k2, (d_h, d_out), jnp.float32),
        }

    def apply(self, params, x, tap_names=()):
        tap = TapCollector(tap_names)
        h = tap("hidden", x @ params["w1"])
        out = tap("head", h @ params["w2"])
        return out, tap.taps


@pytest.fixture(scope="module")
def lin():
    model = LinearTapModel()
    params = model.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (5, 6), jnp.float32)
    return model, params, x


def test_intervention_context_rewrites_downstream(lin):
    model, params, x = lin
    with interventions({"hidden": lambda v: jnp.zeros_like(v)}):
        out, taps = model.apply(params, x, ("hidden",))
    assert np.allclose(np.asarray(out), 0.0)
    # requested tap records the POST-intervention value
    assert np.allclose(np.asarray(taps["hidden"]), 0.0)
    # context exits cleanly: clean forward is unaffected
    out2, _ = model.apply(params, x)
    assert np.abs(np.asarray(out2)).sum() > 0


def test_zero_ablation_matches_closed_form(lin):
    model, params, x = lin
    delta = causal.ablation_effects(model, params, "hidden", x, [0, 2], mode="zero")
    h = np.asarray(x @ params["w1"])
    w2 = np.asarray(params["w2"])
    # removing channel c removes exactly h[:, c] ⊗ w2[c] from the output
    want0 = h[:, 0:1] * w2[0][None, :]
    want2 = h[:, 2:3] * w2[2][None, :]
    np.testing.assert_allclose(np.asarray(delta[0]), want0, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(delta[1]), want2, rtol=1e-5, atol=1e-5)
    # target_class selects one output column
    d1 = causal.ablation_effects(model, params, "hidden", x, [0], target_class=1)
    np.testing.assert_allclose(np.asarray(d1[0]), want0[:, 1], rtol=1e-5, atol=1e-5)


def test_mean_ablation_fills_with_batch_mean(lin):
    model, params, x = lin
    delta = causal.ablation_effects(model, params, "hidden", x, [1], mode="mean")
    h = np.asarray(x @ params["w1"])
    w2 = np.asarray(params["w2"])
    want = (h[:, 1:2] - h[:, 1].mean()) * w2[1][None, :]
    np.testing.assert_allclose(np.asarray(delta[0]), want, rtol=1e-4, atol=1e-5)


def test_activation_patch_full_layer_reproduces_source(lin):
    model, params, x = lin
    y = jax.random.normal(jax.random.PRNGKey(2), x.shape, jnp.float32)
    patched, clean = causal.activation_patch(model, params, "hidden", x, y)
    src_out, _ = model.apply(params, y)
    np.testing.assert_allclose(np.asarray(patched), np.asarray(src_out), rtol=1e-5)
    tgt_out, _ = model.apply(params, x)
    np.testing.assert_allclose(np.asarray(clean), np.asarray(tgt_out), rtol=1e-6)


def test_activation_patch_selected_components(lin):
    model, params, x = lin
    y = jax.random.normal(jax.random.PRNGKey(3), x.shape, jnp.float32)
    patched, _ = causal.activation_patch(model, params, "hidden", x, y, [1, 3])
    hx = np.asarray(x @ params["w1"]).copy()
    hy = np.asarray(y @ params["w1"])
    hx[:, [1, 3]] = hy[:, [1, 3]]
    want = hx @ np.asarray(params["w2"])
    np.testing.assert_allclose(np.asarray(patched), want, rtol=1e-5, atol=1e-5)
    with pytest.raises(ValueError, match="align 1:1"):
        causal.activation_patch(model, params, "hidden", x, y[:3])


def test_steering_adds_direction(lin):
    model, params, x = lin
    direction = np.zeros(4, np.float32)
    direction[2] = 1.0
    out = causal.steer(model, params, "hidden", x, direction, alpha=2.5)
    clean, _ = model.apply(params, x)
    want = np.asarray(clean) + 2.5 * np.asarray(params["w2"])[2][None, :]
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-5, atol=1e-5)


def test_necessity_ratio_separates_causal_from_dead(lin):
    """A channel ablated where it fires hard scores ≫ its score where it
    is silent; LinearTapModel lets us construct both regimes exactly."""
    model, params, _ = lin
    w1 = np.asarray(params["w1"])
    # evidence inputs aligned with channel 0's weight vector → large h[:, 0]
    ev = np.tile(w1[:, 0] / np.linalg.norm(w1[:, 0]), (4, 1)).astype(np.float32) * 3
    # controls orthogonal to channel 0's weights → h[:, 0] ≈ 0
    rng = np.random.default_rng(0)
    ct = rng.normal(size=(4, 6)).astype(np.float32)
    ct -= np.outer(ct @ w1[:, 0], w1[:, 0] / (w1[:, 0] ** 2).sum())
    ratio = causal.necessity_ratio(model, params, "hidden", [0],
                                   jnp.asarray(ev), jnp.asarray(ct))
    assert float(ratio[0]) > 10.0


def test_validates_layer_and_ids(lin):
    model, params, x = lin
    with pytest.raises(ValueError, match="not found"):
        causal.ablation_effects(model, params, "nope", x, [0])
    with pytest.raises(ValueError, match="1-D"):
        causal.ablation_effects(model, params, "hidden", x, [[0]])
    with pytest.raises(ValueError, match="zero"):
        causal.ablation_effects(model, params, "hidden", x, [0], mode="drop")


def test_resnet_family_smoke():
    """The intervention context reaches a real zoo family untouched:
    zero-ablating ALL of layer2's channels must change the logits, and
    effects vmap into one program."""
    from semanticlens_tpu.models import ResNet

    model = ResNet(18, num_classes=7, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 64, 64, 3)), jnp.float32)
    delta = causal.ablation_effects(model, params, "layer2", x, [0, 5, 17])
    assert delta.shape == (3, 2, 7)
    assert np.isfinite(np.asarray(delta)).all()
    assert np.abs(np.asarray(delta)).sum() > 0  # post-BN channels are live


def test_sae_latent_ablation():
    """Knocking out an SAE latent removes exactly its decoder direction's
    contribution: on LinearTapModel the delta is z_f * (W_dec[f] @ w2)."""
    from semanticlens_tpu.sae import SAEConfig, encode, finalize_sae_params, init_sae

    model = LinearTapModel()
    params = model.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (5, 6), jnp.float32)
    cfg = SAEConfig(d_in=4, n_latents=10, k=3)
    sae_params = finalize_sae_params(init_sae(jax.random.PRNGKey(7), cfg), cfg)

    delta = causal.sae_latent_ablation(model, params, "hidden", sae_params, x, [2, 7])
    assert delta.shape == (2, 5, 3)

    # closed form: baseline and ablated differ only by latent f's decode row
    h = x @ params["w1"]
    z = np.asarray(encode(sae_params, h, k=3))
    w_dec = np.asarray(sae_params["W_dec"])
    w2 = np.asarray(params["w2"])
    for j, f in enumerate([2, 7]):
        want = z[:, f : f + 1] * (w_dec[f] @ w2)[None, :]
        np.testing.assert_allclose(np.asarray(delta[j]), want, rtol=1e-4, atol=1e-5)

    # k is derived from the artifact; a bare dict without it raises
    bare = init_sae(jax.random.PRNGKey(7), cfg)
    with pytest.raises(ValueError, match="sparsity unknown"):
        causal.sae_latent_ablation(model, params, "hidden", bare, x, [0])
    # substitute_clean baselines against the raw forward
    d2 = causal.sae_latent_ablation(model, params, "hidden", sae_params, x, [2],
                                    substitute_clean=True)
    assert d2.shape == (1, 5, 3)
    assert np.isfinite(np.asarray(d2)).all()


def test_out_of_range_ids_raise(lin):
    """Out-of-range ids would one_hot to an all-zero row — a silently
    clean 'ablation' — so they must be rejected loudly."""
    model, params, x = lin
    with pytest.raises(ValueError, match="out of range"):
        causal.ablation_effects(model, params, "hidden", x, [4])  # width 4
    with pytest.raises(ValueError, match="out of range"):
        causal.ablation_effects(model, params, "hidden", x, [-1])
    with pytest.raises(ValueError, match="out of range"):
        causal.activation_patch(model, params, "hidden", x, x, [7])

    from semanticlens_tpu.sae import SAEConfig, finalize_sae_params, init_sae

    cfg = SAEConfig(d_in=4, n_latents=10, k=3)
    sp = finalize_sae_params(init_sae(jax.random.PRNGKey(7), cfg), cfg)
    with pytest.raises(ValueError, match="out of range"):
        causal.sae_latent_ablation(model, params, "hidden", sp, x, [10])


def test_ablation_program_reused_across_calls(lin):
    """params/images are jit ARGUMENTS of a cached program — a second call
    (even with different weights) must reuse the compiled program and stay
    closed-form correct."""
    model, params, x = lin
    causal.ablation_effects(model, params, "hidden", x, [0])
    n_programs = len(causal._PROGRAMS)
    params2 = model.init(jax.random.PRNGKey(9))
    d = causal.ablation_effects(model, params2, "hidden", x, [1, 2])
    assert len(causal._PROGRAMS) == n_programs
    h = np.asarray(x @ params2["w1"])
    w2 = np.asarray(params2["w2"])
    for j, c in enumerate([1, 2]):
        want = h[:, c : c + 1] * w2[c][None]
        np.testing.assert_allclose(np.asarray(d[j]), want, rtol=1e-4, atol=1e-5)


def _ident(a):
    return a


def test_engine_step_cache_respects_interventions():
    """The collect engine memoizes its jitted step; a step traced inside an
    `interventions` context bakes the rewrites into the executable, so the
    memo must key on the active context (regression: a clean-then-intervened
    run silently reused the clean program)."""
    from semanticlens_tpu.collect.engine import CollectEngine
    from semanticlens_tpu.data import ArrayDataset

    model = LinearTapModel()
    params = model.init(jax.random.PRNGKey(0))
    rows = np.abs(np.random.default_rng(0).normal(size=(8, 6))).astype(np.float32)
    ds = ArrayDataset(rows, name="causal-engine")
    eng = CollectEngine(model=model, layer_names=["hidden"], aggregation_fn=_ident,
                        n_collect=3)

    clean, _ = eng.run(params, ds, batch_size=4)
    with interventions({"hidden": lambda v: jnp.zeros_like(v)}):
        ablated, _ = eng.run(params, ds, batch_size=4)
    clean2, _ = eng.run(params, ds, batch_size=4)

    assert np.abs(np.asarray(clean["hidden"].values, np.float32)).sum() > 0
    # inside the context every activation is zero — and the run must SEE that
    assert np.allclose(np.asarray(ablated["hidden"].values, np.float32), 0.0)
    # exiting restores the clean program
    np.testing.assert_array_equal(
        np.asarray(clean2["hidden"].values, np.float32),
        np.asarray(clean["hidden"].values, np.float32),
    )


def test_interventions_are_thread_local(lin):
    """A trace running on another thread while this thread is inside an
    interventions context must NOT see the rewrites (the stack is
    thread-local, like the LRP composite state)."""
    import threading

    model, params, x = lin
    results = {}

    def clean_forward():
        out, _ = model.apply(params, x)
        results["clean"] = np.asarray(out)

    with interventions({"hidden": lambda v: jnp.zeros_like(v)}):
        t = threading.Thread(target=clean_forward)
        t.start()
        t.join()
        out_in, _ = model.apply(params, x)
    assert np.abs(results["clean"]).sum() > 0, "other thread saw the intervention"
    assert np.allclose(np.asarray(out_in), 0.0), "context thread must see it"


def test_program_cache_bounded_and_clearable(lin):
    """_PROGRAMS is LRU-bounded and clear_programs() re-traces correctly."""
    model, params, x = lin
    a1 = causal.ablation_effects(model, params, "hidden", x, [0, 1])
    causal.clear_programs()
    assert not causal._PROGRAMS
    a2 = causal.ablation_effects(model, params, "hidden", x, [0, 1])
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), rtol=1e-6)

    old_cap = causal._MAX_PROGRAMS
    try:
        causal._MAX_PROGRAMS = 2
        for layer in ("hidden", "head"):
            causal.ablation_effects(model, params, layer, x, [0])
            causal.ablation_effects(model, params, layer, x, [0], mode="mean")
        assert len(causal._PROGRAMS) <= 2
    finally:
        causal._MAX_PROGRAMS = old_cap
        causal.clear_programs()
