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

import contextlib
from typing import Callable, Mapping, Sequence

import jax

# Stack of active intervention maps (name -> fn(value) -> value). Appended
# by the `interventions` context manager; consulted by every TapCollector
# call, so EVERY subject model supports activation interventions without
# per-model changes. Not thread-local by design: JAX tracing is
# single-threaded per trace, and the context is entered around the trace.
_ACTIVE_INTERVENTIONS: list[dict[str, Callable]] = []


@contextlib.contextmanager
def interventions(mapping: Mapping[str, Callable]):
    """Intervene on named activations during ``model.apply``.

    ``mapping`` takes a module name (any entry of ``model.module_names``)
    to a function ``fn(value) -> value``; the returned tensor REPLACES the
    activation for everything downstream — the semantics of a torch forward
    hook that returns a modified output (the reference registers such hooks
    at activation_caching.py:266-277; it only ever reads, this framework
    also writes). Enables ablation, activation patching, and concept
    steering over every subject family (see :mod:`semanticlens_tpu.causal`).

    Interventions compose with taps: a requested tap records the
    POST-intervention value (what the network actually saw downstream).

    JAX note: enter the context around the TRACE. Closures may reference
    tracers (e.g. a vmapped mask), so one traced program can evaluate many
    interventions; a Python-level change of ``mapping`` requires re-tracing
    (build a fresh jitted fn, as ``semanticlens_tpu.causal`` does).
    """
    _ACTIVE_INTERVENTIONS.append(dict(mapping))
    try:
        yield
    finally:
        _ACTIVE_INTERVENTIONS.pop()


class TapCollector:
    """Accumulates activations for a static set of requested tap names."""

    def __init__(self, tap_names: Sequence[str]):
        self.requested = frozenset(tap_names)
        self.taps: dict[str, jax.Array] = {}

    def __call__(self, name: str, value):
        """Record ``value`` under ``name`` if requested; returns ``value``.

        Active ``interventions`` rewrite ``value`` first (outermost context
        first), so downstream compute and the recorded tap both see the
        intervened activation. Recording twice under the same name keeps
        the last write — matching torch hook semantics for modules invoked
        multiple times (e.g. the shared ReLU in torchvision blocks).
        """
        for mapping in _ACTIVE_INTERVENTIONS:
            fn = mapping.get(name)
            if fn is not None:
                value = fn(value)
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
