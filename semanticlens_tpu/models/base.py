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
import itertools
import threading
from typing import Callable, Mapping, Sequence

import jax

# Per-thread stack of active intervention maps (name -> fn(value) -> value),
# appended by the `interventions` context manager and consulted by every
# TapCollector call, so EVERY subject model supports activation interventions
# without per-model changes. Thread-local like the LRP composite state in
# models/layers.py: two traces on two threads must not see each other's
# rewrites. Each stack entry carries a unique token (see
# ``interventions_fingerprint``) so jit caches can key on the active context.
_TLS = threading.local()
_TOKENS = itertools.count()


def _active_stack() -> list[tuple[int, dict[str, Callable]]]:
    stack = getattr(_TLS, "stack", None)
    if stack is None:
        stack = _TLS.stack = []
    return stack


def interventions_fingerprint() -> tuple[int, ...]:
    """Tokens of the interventions contexts active on this thread.

    ``()`` when clean. Any code that MEMOIZES a traced/compiled program
    whose trace consults interventions (e.g. the collect engine's jitted
    step) must include this in its cache key — a program traced inside an
    ``interventions`` context bakes the rewrites in, and one traced outside
    ignores them; reusing either across the context boundary is silently
    wrong.
    """
    return tuple(token for token, _ in _active_stack())


def has_intervention(name: str) -> bool:
    """True when an active ``interventions`` context targets ``name``.

    A Python-time (trace-time) check — models use it to route to an
    intervention-capable formulation of a virtual tap (e.g. the per-head
    attention taps) only when someone is actually rewriting it, keeping the
    plain forward byte-identical to the untapped program.
    """
    return any(name in mapping for _, mapping in _active_stack())


def apply_interventions(name: str, value):
    """Run the active intervention fns registered for ``name`` (outermost
    context first — the same order :class:`TapCollector` applies them).
    Returns ``value`` unchanged when nothing targets the name."""
    for _, mapping in _active_stack():
        fn = mapping.get(name)
        if fn is not None:
            value = fn(value)
    return value


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
    (build a fresh jitted fn, as ``semanticlens_tpu.causal`` does). Code
    that memoizes compiled programs must key on
    :func:`interventions_fingerprint` (the collect engine does); a plain
    ``jax.jit`` built and cached OUTSIDE the context will not see it.
    """
    _active_stack().append((next(_TOKENS), dict(mapping)))
    try:
        yield
    finally:
        _active_stack().pop()


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
        for _, mapping in _active_stack():
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
