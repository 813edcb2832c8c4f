"""Token-level LRP attributions for language-model components.

Text analogue of the vision attribution path (reference capability:
relevance-selected, attribution-cropped concept examples,
relevance_based.py:202-246 — there via crp/zennit on images): for an LM
component (an MLP neuron, an attention head, an SAE latent tap), compute
how much each TOKEN of the input drives it, so text evidence can be
highlighted the way image evidence is cropped.

Tokens are discrete — there is no gradient w.r.t. an int id — so relevance
is taken at the EMBEDDING layer, the standard convention for transformer
LRP (Ali et al. 2022): inject an additive zero perturbation at the
embedding tap through the ``interventions`` mechanism and pull the
component's relevance back to it with the composite-modified VJP. The
composite's custom VJPs propagate RELEVANCE directly (cotangent in =
relevance out — the convention the conservation tests pin), so the seed is
the component's own activation and the per-token relevance is the VJP
output summed over features. Under the ε composite with the transformer
rules (detached-LN, CP-LRP attention —
:mod:`semanticlens_tpu.models.layers`) the per-token sums conserve the
target activation on bias-free, positional-embedding-free paths (both are
input-independent additive branches that absorb a relevance share).

The whole attribution — forward, modified backward, contraction — compiles
to one XLA program per (layer, batch shape).
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp

from semanticlens_tpu.models.base import interventions
from semanticlens_tpu.models.layers import lrp_composite


# embedding-layer tap names of the built-in LM families, tried in order
# when the caller doesn't pass embedding_tap explicitly
_KNOWN_EMBEDDING_TAPS = ("transformer.wte", "model.embed_tokens")


def make_token_relevance_fn(
    model,
    layer_name: str,
    *,
    embedding_tap: str | None = None,
    composite: str = "epsilon_plus_flat",
    aggregation: str = "sum",
    abs_norm: bool = True,
):
    """Build a jitted ``(params, tokens (B,T), component ()) → (B,T)`` fn.

    ``component`` is a traced integer — one compiled program serves every
    component of the layer. The target is the component's token-aggregated
    activation (``sum`` or ``max``); the returned matrix is the signed
    per-token relevance (grad × embedding, summed over the feature axis),
    optionally abs-max-normalized per sequence. ``embedding_tap`` defaults
    to the model's own embedding module (GPT-2's ``transformer.wte`` or
    Llama's ``model.embed_tokens``); pass it for other naming conventions.
    """
    if embedding_tap is None:
        embedding_tap = next(
            (t for t in _KNOWN_EMBEDDING_TAPS if model.has_module(t)), None)
        if embedding_tap is None:
            raise ValueError(
                "no known embedding tap in model.module_names — pass "
                "embedding_tap= for non-GPT/Llama naming conventions"
            )
    elif not model.has_module(embedding_tap):
        raise ValueError(
            f"embedding tap '{embedding_tap}' not in model.module_names — "
            "pass embedding_tap= for non-GPT naming conventions"
        )

    def relevance(params, tokens, component):
        _, taps = model.apply(params, tokens, (embedding_tap,))
        emb = taps[embedding_tap].astype(jnp.float32)

        def f(delta):
            def rewrite(v):
                return v + delta.astype(v.dtype)

            with interventions({embedding_tap: rewrite}):
                _, inner = model.apply(params, tokens, (layer_name,))
            act = inner[layer_name].astype(jnp.float32)
            if act.ndim != 3:
                raise ValueError(f"{layer_name} must tap (B, T, C), got {act.shape}")
            return act

        ctx = lrp_composite(composite) if composite != "gradient" else contextlib.nullcontext()
        with ctx:
            act, vjp_fn = jax.vjp(f, jnp.zeros_like(emb))
            # seed = the component's own activation (relevance convention);
            # "max" seeds only the peak token position (crp's max_target)
            onehot = jax.nn.one_hot(component, act.shape[-1], dtype=jnp.float32)
            if aggregation == "max":
                comp_act = jnp.einsum("btc,c->bt", act, onehot)
                tok_mask = jax.nn.one_hot(
                    jnp.argmax(comp_act, axis=1), act.shape[1], dtype=jnp.float32)
                seed = act * onehot * tok_mask[:, :, None]
            else:
                seed = act * onehot
            (r_emb,) = vjp_fn(seed)
        rel = jnp.sum(r_emb.astype(jnp.float32), axis=-1)  # (B, T)
        if abs_norm:
            rel = rel / (jnp.max(jnp.abs(rel), axis=1, keepdims=True) + 1e-12)
        return rel

    return jax.jit(relevance)


def token_relevance(model, params, tokens, layer_name, component, **kwargs):
    """One-shot convenience wrapper around :func:`make_token_relevance_fn`."""
    fn = make_token_relevance_fn(model, layer_name, **kwargs)
    return fn(params, jnp.asarray(tokens), jnp.asarray(component))


def highlight_evidence(token_strings, relevances, *, threshold: float = 0.5,
                       marker: str = "**"):
    """Render relevance-highlighted evidence strings (the text 'crop').

    ``token_strings``: per-sample list of the tokens' surface strings (the
    caller detokenizes — tokenizers differ); tokens whose |relevance| ≥
    ``threshold`` · max are wrapped in ``marker`` pairs. Returns one string
    per sample. The vision analogue is the attribution-cropped concept
    example (utils/render.py crop_and_mask_images).
    """
    import numpy as np

    out = []
    for strings, rel in zip(token_strings, np.asarray(relevances)):
        rel = np.abs(rel[: len(strings)])
        cut = threshold * (rel.max() + 1e-12)
        out.append(" ".join(
            f"{marker}{s}{marker}" if r >= cut else s
            for s, r in zip(strings, rel)
        ))
    return out
