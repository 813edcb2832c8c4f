"""Every advertised module name must be a CAUSAL intervention target.

``causal.py`` promises "ablate / patch / steer any subject component"; an
``interventions`` rewrite whose value a model silently discards fabricates
all-zero ablation deltas (the round-3 review found exactly this for the
virtual ``…attn.heads`` taps, ConvNeXt's ``avgpool``, and a dozen container
taps). This test perturbs a stratified sample of every family's module
names (+1 additive rewrite) and asserts the model OUTPUT changes — the
property that makes torch forward-hook rewrites causal (reference
activation_caching.py:266-277 registers such hooks).

Adapters that structurally cannot feed rewrites (torch host callback, linen
capture_intermediates) must refuse loudly instead — pinned here too.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semanticlens_tpu.models import GPT2, Llama
from semanticlens_tpu.models.base import interventions

from test_tap_contract import _CASES

B = 2


def _sampled_names(names):
    """Deterministic stratified sample: every k-th name so the suite stays
    fast, plus the virtual/structural names the review flagged."""
    names = list(names)
    stride = max(1, len(names) // 12)
    picked = set(names[::stride]) | {names[0], names[-1]}
    picked |= {
        n
        for n in names
        if n.endswith((".heads", "avgpool", "features", "wpe"))
        or n in ("stem", "stages", "blocks", "encoder", "classifier", "head")
    }
    return sorted(picked)


def _perturb(v):
    # channel-VARYING shift: a uniform +1 would sit in LayerNorm's null
    # space (mean subtraction removes it), masking genuinely causal taps
    # that feed straight into an LN (e.g. ConvNeXt's conv_dw).
    ramp = jnp.arange(v.shape[-1], dtype=jnp.float32) / max(1, v.shape[-1])
    return v + (1.0 + ramp).astype(v.dtype)


def _assert_causal(model, params, x, names):
    clean, _ = model.apply(params, x, ())
    clean = np.asarray(clean, np.float32)
    dead = []
    for name in names:
        with interventions({name: _perturb}):
            out, _ = model.apply(params, x, ())
        if not np.any(np.abs(np.asarray(out, np.float32) - clean) > 0):
            dead.append(name)
    assert not dead, f"interventions silently ignored on: {dead}"


@pytest.mark.parametrize("name,make,size", _CASES, ids=[c[0] for c in _CASES])
def test_vision_interventions_are_causal(name, make, size):
    model = make()
    params = model.init(jax.random.PRNGKey(0))
    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(B, size, size, 3)).astype(np.float32)
    )
    _assert_causal(model, params, x, _sampled_names(model.module_names))


_LM_CASES = [
    (
        "gpt2",
        lambda: GPT2(vocab_size=61, n_positions=16, width=32, depth=2, heads=4,
                     dtype=jnp.float32),
    ),
    (
        "llama",
        lambda: Llama(vocab_size=61, n_positions=16, width=32, depth=2, heads=4,
                      kv_heads=2, intermediate=48, dtype=jnp.float32),
    ),
]


@pytest.mark.parametrize("name,make", _LM_CASES, ids=[c[0] for c in _LM_CASES])
def test_lm_interventions_are_causal(name, make):
    model = make()
    params = model.init(jax.random.PRNGKey(0))
    toks = jnp.asarray(np.random.default_rng(2).integers(1, 61, size=(B, 8), dtype=np.int32))
    _assert_causal(model, params, toks, _sampled_names(model.module_names))


def test_head_ablation_is_causal_and_tap_free_forward_is_identical():
    """The virtual heads tap: requesting it must not change the forward;
    zero-ablating one head through it must."""
    model = GPT2(vocab_size=61, n_positions=16, width=32, depth=2, heads=4,
                 dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0))
    toks = jnp.asarray([[5, 6, 7, 8]], jnp.int32)
    clean, _ = model.apply(params, toks, ())
    tapped, taps = model.apply(params, toks, ("transformer.h.0.attn.heads",))
    np.testing.assert_array_equal(np.asarray(clean), np.asarray(tapped))
    assert taps["transformer.h.0.attn.heads"].shape == (1, 4, 4)

    mask = np.ones((1, 1, 4), np.float32)
    mask[..., 1] = 0.0
    with interventions({"transformer.h.0.attn.heads": lambda v: v * mask}):
        ablated, _ = model.apply(params, toks, ())
    assert np.abs(np.asarray(ablated) - np.asarray(clean)).max() > 0


def test_adapters_refuse_interventions_loudly():
    torch = pytest.importorskip("torch")
    from semanticlens_tpu.models import TorchSubjectModel

    net = torch.nn.Sequential(torch.nn.Conv2d(3, 4, 3), torch.nn.ReLU()).eval()
    subject = TorchSubjectModel(net, name="t")
    x = jnp.zeros((1, 8, 8, 3), jnp.float32)
    layer = subject.module_names[0]
    with interventions({layer: lambda v: v + 1.0}):
        with pytest.raises(NotImplementedError, match="TorchSubjectModel"):
            subject.apply({}, x, ())
