"""Adapter exposing flax.linen modules as tappable subject models.

Users with existing Flax models shouldn't have to rewrite them with
:class:`~semanticlens_tpu.models.base.TapCollector`: linen's
``capture_intermediates`` already records every submodule's outputs. This
adapter maps those capture paths to dotted layer names (``"layers_0.conv"``)
so the Collect engine and visualizers work unchanged.

The analogue of torch ``named_modules`` coverage: any submodule path that
linen captures is a valid ``layer_name``; ``module_names`` is discovered with
one ``eval_shape`` trace (no FLOPs).
"""

from __future__ import annotations

from typing import Mapping, Sequence

import jax

from semanticlens_tpu.models.base import SubjectModel


class FlaxSubjectModel(SubjectModel):
    """Wrap a ``flax.linen.Module`` as a SubjectModel.

    Parameters
    ----------
    module : the linen module (its ``__call__`` takes a batch of inputs).
    example_input : an array or ``jax.ShapeDtypeStruct`` (anything with
        ``.shape``/``.dtype``) used once to discover the tap-able module
        names via ``jax.eval_shape``.
    params : optional variables dict ``{"params": ...}`` or the inner params
        tree; stored on the instance for the visualizers.
    apply_kwargs : extra kwargs for ``module.apply`` (e.g. ``train=False``).
    """

    def __init__(self, module, example_input, params=None, **apply_kwargs):
        self.module = module
        self.apply_kwargs = apply_kwargs
        if params is not None:
            self.params = params if "params" in params else {"params": params}
        self._example = jax.ShapeDtypeStruct(example_input.shape, example_input.dtype)
        self.module_names = tuple(self._discover_names())

    # ------------------------------------------------------------------ names
    def _discover_names(self):
        variables = jax.eval_shape(
            lambda: self.module.init(
                jax.random.PRNGKey(0),
                jax.numpy.zeros(self._example.shape, self._example.dtype),
                **self.apply_kwargs,
            )
        )

        def trace(params):
            _, state = self.module.apply(
                params,
                jax.numpy.zeros(self._example.shape, self._example.dtype),
                capture_intermediates=True,
                mutable=["intermediates"],
                **self.apply_kwargs,
            )
            return state["intermediates"]

        intermediates = jax.eval_shape(trace, variables)
        names = []

        def walk(tree, prefix):
            if isinstance(tree, Mapping):
                for key, sub in tree.items():
                    if key == "__call__":
                        # The root module's own output has an empty path and
                        # cannot be addressed through the capture filter —
                        # exclude it (it is the model output, not a tap).
                        if prefix:
                            names.append(prefix)
                    else:
                        walk(sub, f"{prefix}.{key}" if prefix else key)

        walk(intermediates, "")
        return names

    # ------------------------------------------------------------------ apply
    def init(self, rng):
        import jax.numpy as jnp

        return self.module.init(
            rng, jnp.zeros(self._example.shape, self._example.dtype), **self.apply_kwargs
        )

    def apply(self, params: Mapping, x, tap_names: Sequence[str] = ()):
        from semanticlens_tpu.models.base import has_intervention

        targeted = [n for n in self.module_names if has_intervention(n)]
        if targeted:
            # capture_intermediates can read but not rewrite linen module
            # outputs; a silent no-op would fabricate all-zero causal
            # results, so refuse loudly.
            raise NotImplementedError(
                f"interventions on FlaxSubjectModel modules {targeted} are not "
                "supported (linen capture_intermediates is read-only). Port "
                "the subject to a native family for causal analysis."
            )
        variables = params if "params" in params else {"params": params}
        if not tap_names:
            out = self.module.apply(variables, x, **self.apply_kwargs)
            return out, {}

        requested = set(tap_names)

        def keep(mdl, method_name):
            # linen filter signature: (module, method_name) → bool.
            return method_name == "__call__" and ".".join(mdl.path) in requested

        out, state = self.module.apply(
            variables,
            x,
            capture_intermediates=keep,
            mutable=["intermediates"],
            **self.apply_kwargs,
        )
        taps = {}

        def walk(tree, prefix):
            if isinstance(tree, Mapping):
                for key, sub in tree.items():
                    if key == "__call__":
                        # linen stores a tuple of outputs per call; the last
                        # call wins (torch hook semantics for reused modules).
                        name = prefix
                        value = sub[-1] if isinstance(sub, (tuple, list)) else sub
                        if name in requested:
                            taps[name] = value
                    else:
                        walk(sub, f"{prefix}.{key}" if prefix else key)

        walk(state["intermediates"], "")
        missing = requested - set(taps)
        if missing:
            raise KeyError(f"Taps not found in flax intermediates: {sorted(missing)}")
        return out, taps

    def __repr__(self):
        return f"FlaxSubjectModel({type(self.module).__name__})"
