"""Per-component input attributions via LRP or plain gradients.

TPU-native replacement for the reference's crp/zennit attribution path
(reference: semanticlens/component_visualization/relevance_based.py:202-246 —
``CondAttribution`` + ``EpsilonPlusFlat``). Heatmaps are computed with
``jax.grad`` over a model trace in which the linear primitives carry modified
LRP backwards (:func:`semanticlens_tpu.models.layers.lrp_composite`), so the
whole attribution — forward, modified backward, channel reduction — compiles
to one XLA program per (layer, batch-shape).
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp

from semanticlens_tpu.models.layers import lrp_composite


def _make_heatmap_core(model, layer_name, composite, aggregation, abs_norm):
    """Traceable ``(params, images (B,H,W,C), component ()) → (B,H,W)`` core."""

    def target(params, images, component):
        _, taps = model.apply(params, images.astype(jnp.float32), (layer_name,))
        act = taps[layer_name].astype(jnp.float32)
        if act.ndim == 4:
            agg = jnp.sum(act, axis=(1, 2)) if aggregation == "sum" else jnp.max(act, axis=(1, 2))
        elif act.ndim == 3:
            agg = jnp.sum(act, axis=1) if aggregation == "sum" else jnp.max(act, axis=1)
        else:
            agg = act
        return jnp.sum(agg[:, component])

    def heatmaps(params, images, component):
        with lrp_composite(composite) if composite != "gradient" else contextlib.nullcontext():
            grads = jax.grad(target, argnums=1)(params, images.astype(jnp.float32), component)
        heat = jnp.sum(grads.astype(jnp.float32), axis=-1)  # channels → (B, H, W)
        if abs_norm:
            denom = jnp.max(jnp.abs(heat), axis=(1, 2), keepdims=True) + 1e-12
            heat = heat / denom
        return heat

    return heatmaps


def make_attribution_fn(
    model,
    layer_name: str,
    *,
    composite: str = "epsilon_plus_flat",
    aggregation: str = "sum",
    abs_norm: bool = True,
):
    """Build a jitted ``(params, images, component) → (B, H, W) heatmaps`` fn.

    ``component`` is a traced integer array — one compiled program serves all
    components of the layer. The attribution target is the component's
    aggregated activation (spatial/token ``sum`` or ``max`` — crp's
    ``max_target``); the heatmap is the signed input relevance summed over
    channels, optionally abs-max-normalized per image.
    """
    heatmaps = _make_heatmap_core(model, layer_name, composite, aggregation, abs_norm)

    # jit must trace INSIDE the composite context → wrap the traced fn, not
    # the context: re-enter the context per trace via a custom lowering.
    # Gradients require inexact inputs: uint8 datasets (the recommended
    # transport format) cast at the boundary; grads are wrt float pixels.
    return jax.jit(heatmaps)


def make_batched_attribution_fn(
    model,
    layer_name: str,
    *,
    composite: str = "epsilon_plus_flat",
    aggregation: str = "sum",
    abs_norm: bool = True,
):
    """Jitted ``(params, images (K,S,H,W,C), components (K,)) → (K,S,H,W)``.

    Attributes K components — each over its OWN image set — inside ONE XLA
    program (vmap over the single-component core). The per-component concept-
    example workload (reference get_max_reference, relevance_based.py:202-246)
    is otherwise one dispatch per component; on a ~32 ms-latency runtime the
    batched program amortizes that K× and keeps the MXU busy across the
    K backward passes. Measured on v5e: see docs/PERF_NOTES.md.
    """
    heatmaps = _make_heatmap_core(model, layer_name, composite, aggregation, abs_norm)
    return jax.jit(jax.vmap(heatmaps, in_axes=(None, 0, 0)))



def component_heatmaps(model, params, images, layer_name, component, **kwargs):
    """One-shot convenience wrapper around :func:`make_attribution_fn`."""
    fn = make_attribution_fn(model, layer_name, **kwargs)
    return fn(params, jnp.asarray(images), jnp.asarray(component))
