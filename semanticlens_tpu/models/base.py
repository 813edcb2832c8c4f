"""Subject-model protocol: functional forward with named activation taps.

PyTorch SemanticLens captures activations with forward hooks on
``named_modules`` (reference:
semanticlens/component_visualization/activation_caching.py:266-277). JAX has
no module hooks, so subject models implement a **tap** contract instead:

    logits, taps = model.apply(params, x, tap_names=("layer4", ...))

``tap_names`` is a static (Python-time) tuple — requesting different taps
recompiles, but within a run the captured dict has fixed structure, so the
whole Collect step [forward → aggregate → top-k] fuses into one XLA program.
Models expose ``module_names`` so user-facing layer validation keeps the
reference API promise (``layer_names=["layer4"]``, reference
activation_based.py:217-228).
"""

from __future__ import annotations

from typing import Callable, Mapping, Sequence

import jax


class TapCollector:
    """Accumulates activations for a static set of requested tap names."""

    def __init__(self, tap_names: Sequence[str]):
        self.requested = frozenset(tap_names)
        self.taps: dict[str, jax.Array] = {}

    def __call__(self, name: str, value):
        """Record ``value`` under ``name`` if requested; returns ``value``.

        Recording twice under the same name keeps the last write — matching
        torch hook semantics for modules invoked multiple times (e.g. the
        shared ReLU in torchvision blocks).
        """
        if name in self.requested:
            self.taps[name] = value
        return value


class SubjectModel:
    """Base class for functional subject models.

    Subclasses define:

    - ``module_names``: every tap-able name (torch ``named_modules`` parity);
    - ``init(rng) -> params``: random parameters (flat dict, torch key names);
    - ``apply(params, x, tap_names) -> (output, {name: activation})``.

    Instances may carry ``.params`` and ``.name`` for use with the
    ActivationComponentVisualizer.
    """

    module_names: tuple[str, ...] = ()

    def init(self, rng) -> dict:
        raise NotImplementedError

    def apply(self, params: Mapping, x, tap_names: Sequence[str] = ()):
        raise NotImplementedError

    def has_module(self, name: str) -> bool:
        return name in self.module_names


def validate_layers(model: SubjectModel, layer_names: Sequence[str]) -> None:
    """Raise ValueError for unknown layer names (reference contract,
    activation_based.py:217-228)."""
    for layer in layer_names:
        if not model.has_module(layer):
            raise ValueError(f"Layer '{layer}' not found in model.")


AggregationFn = Callable[[jax.Array], jax.Array]
