"""Causal interventions on subject-model components: ablate, patch, steer.

Beyond-reference capability. SemanticLens names what a component *encodes*
(correlational: top-activating evidence embedded by the FM, reference
activation_based.py:41); this module tests what a component *causes* —
the other half of an interpretability audit. Because every subject model
routes activations through the tap contract
(:class:`semanticlens_tpu.models.base.TapCollector`), the
:func:`~semanticlens_tpu.models.base.interventions` context rewrites any
named activation in ANY family (ResNet … Swin … SAE virtual taps) with no
per-model code.

Primitives (all pure JAX — one traced program evaluates a whole batch of
interventions via ``vmap`` over masks; the MXU sees K forwards as one
batched program rather than K dispatches):

- :func:`ablation_effects` — zero- or mean-ablate components, return the
  per-component output delta ("necessity" of the component);
- :func:`activation_patch` — interchange intervention: run target images
  with selected components' activations transplanted from source images
  (causal-tracing style);
- :func:`steer` — add a concept direction at a layer ("concept steering");
- :func:`necessity_ratio` — ablation effect on a component's own evidence
  images relative to control images: a causal validation score for the
  Collect stage's concept examples.

Typical audit: collect evidence with ActivationComponentVisualizer, name
components with ``Lens.label_components``, then confirm the named concept
is causally load-bearing with ``necessity_ratio`` — components whose
naming is an artifact of correlated context score ≈ 1 (no more necessary
on their own evidence than anywhere else).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from semanticlens_tpu.models.base import SubjectModel, interventions, validate_layers

__all__ = [
    "ablation_effects",
    "activation_patch",
    "steer",
    "necessity_ratio",
    "sae_latent_ablation",
    "clear_programs",
]

# Compiled ablation programs, keyed by (id(model), layer_name[, k]). The
# cached fn closes over the model (keeping it alive, so ids are never
# reused while an entry exists) and takes masks/params/images as jit
# ARGUMENTS — a fresh `jax.jit(vmap(run))` per call would embed the full
# parameter set as jaxpr constants and pay a retrace+compile every call.
# LRU-bounded: a long-lived audit process cycling models/layers evicts the
# oldest executable instead of pinning every model it ever touched alive.
_PROGRAMS: dict[tuple, object] = {}
_MAX_PROGRAMS = 16


def clear_programs() -> None:
    """Drop all cached compiled ablation programs (and the model references
    their closures hold). They re-trace on next use."""
    _PROGRAMS.clear()


def _cache_program(key, program):
    _PROGRAMS[key] = program
    while len(_PROGRAMS) > _MAX_PROGRAMS:
        _PROGRAMS.pop(next(iter(_PROGRAMS)))  # evict least recently used
    return program


def _get_program(key):
    """Cached-program lookup that refreshes recency on hit — true LRU, so a
    hot program cycling with cold ones is never the eviction victim."""
    program = _PROGRAMS.pop(key, None)
    if program is not None:
        _PROGRAMS[key] = program
    return program


def _validated_ids(ids, width: int, what: str) -> np.ndarray:
    """Host-side id validation. out-of-range ids would one_hot to an
    all-zero row — a silently clean 'ablation' — so reject them loudly."""
    ids = np.asarray(ids, np.int64)
    if ids.ndim != 1:
        raise ValueError(f"{what} must be 1-D, got shape {tuple(ids.shape)}")
    if ids.size and (ids.min() < 0 or ids.max() >= width):
        bad = ids[(ids < 0) | (ids >= width)]
        raise ValueError(
            f"{what} out of range for width {width}: {bad.tolist()} "
            "(ids must index the tapped layer, 0 <= id < width)"
        )
    return ids.astype(np.int32)


def _component_masks(component_ids, width: int):
    ids = _validated_ids(component_ids, width, "component_ids")
    return 1.0 - jax.nn.one_hot(ids, width, dtype=jnp.float32)  # (K, C) keep-masks


def ablation_effects(
    model: SubjectModel,
    params,
    layer_name: str,
    images,
    component_ids: Sequence[int],
    *,
    mode: str = "zero",
    target_class: int | None = None,
):
    """Output change caused by knocking out each component of a layer.

    For every ``component_ids[k]``, runs the model with that channel of
    ``layer_name`` replaced by 0 (``mode="zero"``) or by its batch-mean
    activation (``mode="mean"``, the gentler ablation that stays on the
    layer's manifold) and returns ``clean_output − ablated_output``:

    - shape ``(K, B, n_out)``, or ``(K, B)`` when ``target_class`` picks a
      single output column.

    All K ablations compile into ONE program (vmap over keep-masks), so a
    whole layer's necessity profile is a single dispatch.
    """
    if mode not in ("zero", "mean"):
        raise ValueError(f"mode must be 'zero' or 'mean', got {mode!r}")
    validate_layers(model, [layer_name])
    clean_out, taps = model.apply(params, images, (layer_name,))
    act = taps[layer_name]
    width = act.shape[-1]
    masks = _component_masks(component_ids, width)
    if mode == "mean":
        fill = jnp.mean(
            act.astype(jnp.float32), axis=tuple(range(act.ndim - 1))
        )  # (C,) dataset-free batch mean
    else:
        fill = jnp.zeros((width,), jnp.float32)

    key = (id(model), layer_name)
    program = _get_program(key)
    if program is None:

        def run(mask, fill, params, images):
            def rewrite(v):
                return (v * mask + (1.0 - mask) * fill).astype(v.dtype)

            with interventions({layer_name: rewrite}):
                out, _ = model.apply(params, images, ())
            return out

        program = _cache_program(key, jax.jit(jax.vmap(run, in_axes=(0, None, None, None))))

    ablated = program(masks, fill, params, images)  # (K, B, n_out)
    delta = clean_out[None].astype(jnp.float32) - ablated.astype(jnp.float32)
    if target_class is not None:
        delta = delta[..., target_class]
    return delta


def activation_patch(
    model: SubjectModel,
    params,
    layer_name: str,
    target_images,
    source_images,
    component_ids: Sequence[int] | None = None,
):
    """Interchange intervention: run ``target_images`` with the selected
    components of ``layer_name`` carrying the activations they would have
    on ``source_images`` (rows are paired 1:1 — shapes must match).

    ``component_ids=None`` patches the whole layer (a full causal trace of
    everything downstream). Returns ``(patched_output, clean_output)``.
    """
    validate_layers(model, [layer_name])
    _, src_taps = model.apply(params, source_images, (layer_name,))
    src = src_taps[layer_name]
    clean_out, tgt_taps = model.apply(params, target_images, (layer_name,))
    if tgt_taps[layer_name].shape != src.shape:
        raise ValueError(
            f"source/target activations must align 1:1 at {layer_name}: "
            f"{src.shape} vs {tgt_taps[layer_name].shape}"
        )
    if component_ids is None:
        patch_mask = jnp.ones((src.shape[-1],), jnp.float32)
    else:
        patch_mask = 1.0 - _component_masks(component_ids, src.shape[-1]).prod(axis=0)

    def rewrite(v):
        return (v * (1.0 - patch_mask) + src.astype(jnp.float32) * patch_mask).astype(v.dtype)

    with interventions({layer_name: rewrite}):
        patched_out, _ = model.apply(params, target_images, ())
    return patched_out, clean_out


def steer(
    model: SubjectModel,
    params,
    layer_name: str,
    images,
    direction,
    *,
    alpha: float = 1.0,
):
    """Concept steering: add ``alpha · direction`` to ``layer_name``'s
    activation (direction broadcasts against the activation's last axis —
    pass a (C,) vector for channel-space steering) and return the output."""
    validate_layers(model, [layer_name])
    direction = jnp.asarray(direction)

    def rewrite(v):
        return (v.astype(jnp.float32) + alpha * direction).astype(v.dtype)

    with interventions({layer_name: rewrite}):
        out, _ = model.apply(params, images, ())
    return out


def sae_latent_ablation(
    model: SubjectModel,
    params,
    layer_name: str,
    sae_params,
    images,
    latent_ids: Sequence[int],
    *,
    k: int | None = None,
    substitute_clean: bool = False,
):
    """Causal effect of individual SAE latents on the model output.

    An SAE latent is a virtual component — it never feeds the forward pass
    directly — so knocking it out means rewriting the layer it was trained
    on: ``activation → encode → zero latent f → decode`` replaces
    ``layer_name``'s activation for everything downstream. Returns
    ``(K, B, n_out)`` deltas ``baseline_output − ablated_output`` where the
    baseline runs the full SAE reconstruction through the same path (so the
    measured effect isolates the LATENT, not the SAE's reconstruction
    error; pass ``substitute_clean=True`` to baseline against the raw
    un-reconstructed forward instead).

    ``k`` defaults to the encode-time sparsity stamped into ``sae_params``
    (see :func:`semanticlens_tpu.sae.finalize_sae_params`).
    """
    from semanticlens_tpu.sae import decode, encode

    validate_layers(model, [layer_name])
    stored_k = sae_params.get("k") if hasattr(sae_params, "get") else None
    if k is None:
        if stored_k is None:
            raise ValueError(
                "encode-time sparsity unknown: pass k= or use sae_params "
                "carrying a 'k' entry (the trainers stamp it)"
            )
        k = int(stored_k)
    n_latents = sae_params["W_dec"].shape[0]
    ids = _validated_ids(latent_ids, n_latents, "latent_ids")
    keep_masks = 1.0 - jax.nn.one_hot(ids, n_latents, dtype=jnp.float32)  # (K, L)

    cache_key = (id(model), layer_name, "sae", int(k))
    program = _get_program(cache_key)
    if program is None:

        def run(keep, params, sae_params, images):
            def rewrite(v):
                z = encode(sae_params, v, k=k)
                return decode(sae_params, z * keep).astype(v.dtype)

            with interventions({layer_name: rewrite}):
                out, _ = model.apply(params, images, ())
            return out

        program = _cache_program(
            cache_key, jax.jit(jax.vmap(run, in_axes=(0, None, None, None)))
        )

    ablated = program(keep_masks, params, sae_params, images)  # (K, B, n_out)
    if substitute_clean:
        baseline, _ = model.apply(params, images, ())
    else:
        # full-reconstruction baseline = the same program with a keep-all mask
        baseline = program(
            jnp.ones((1, n_latents), jnp.float32), params, sae_params, images
        )[0]
    return baseline[None].astype(jnp.float32) - ablated.astype(jnp.float32)


def necessity_ratio(
    model: SubjectModel,
    params,
    layer_name: str,
    component_ids: Sequence[int],
    evidence_images,
    control_images,
    *,
    mode: str = "zero",
    eps: float = 1e-9,
):
    """Causal validation of concept evidence: how much MORE the model's
    output depends on a component on that component's own top-activating
    images than on control images.

    Returns ``(K,)`` ratios ``‖Δ_evidence‖ / (‖Δ_control‖ + eps)`` of
    mean ablation-induced output-change norms. Ratios ≫ 1 mean the
    component is causally load-bearing exactly where the Collect stage
    says it fires — the named concept is not a passenger correlation.
    """
    d_ev = ablation_effects(model, params, layer_name, evidence_images,
                            component_ids, mode=mode)
    d_ct = ablation_effects(model, params, layer_name, control_images,
                            component_ids, mode=mode)

    def per_component(d):  # norm over the output axis, mean over the rest
        # sequence models emit (K, B, T, n_out) — reduce every non-K axis so
        # the ratio is (K,) for classifiers and LMs alike
        return jnp.linalg.norm(d, axis=-1).mean(axis=tuple(range(1, d.ndim - 1)))

    return per_component(d_ev) / (per_component(d_ct) + eps)
