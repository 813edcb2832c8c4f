"""Adapter running an arbitrary ``torch.nn.Module`` as a tappable subject.

The reference's core usability promise is "bring ANY torch model" — it hooks
``named_modules`` at runtime (reference: semanticlens/component_visualization/
activation_caching.py:266-277), so a user's existing checkpointed torchvision /
timm / custom module works without rewriting. The named JAX families
(:mod:`~semanticlens_tpu.models.resnet` etc.) cover the common architectures
natively; this adapter closes the long tail: the torch forward runs on the
host (exactly where the reference runs it) behind :func:`jax.pure_callback`,
while everything downstream — aggregation, the donated top-k merge, FM
embedding, scores — stays in the framework's jitted device path.

Contract mapping:

- ``module_names`` = torch ``named_modules()`` names (hookable-name parity);
- taps are the hooked module *outputs*; rank-4 outputs are transposed
  NCHW → NHWC to match the framework's channels-last aggregators
  (:mod:`semanticlens_tpu.ops.aggregators`);
- a module invoked multiple times per forward keeps its **last** output,
  matching :class:`~semanticlens_tpu.models.base.TapCollector` semantics
  (torch hooks fire per call; the reference updates its top-k on every
  firing — for repeated modules prefer tapping distinct wrapper names);
- ``init``/``params`` are vestigial (weights live inside the torch module) —
  ``init`` returns ``{}`` and ``apply`` ignores ``params``.

Limitations (inherent, documented rather than papered over):

- no JAX autodiff through the callback → the relevance/LRP visualizer
  rejects torch subjects (use a native family for attribution);
- no mesh data-parallelism: the forward serializes through one host process
  anyway, so sharding it buys nothing — construct the engine without a mesh;
- throughput is the host's torch throughput. This is a *capability* path
  (reference parity for arbitrary models), not a speed path.
"""

from __future__ import annotations

from typing import Mapping, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from semanticlens_tpu.models.base import SubjectModel


def _first_tensor(value, torch):
    """The hookable payload of a module output: the output itself if it is a
    tensor, else the first tensor inside a tuple/list (torch hook users face
    the same choice; the reference's aggregators reject non-tensors)."""
    if isinstance(value, torch.Tensor):
        return value
    if isinstance(value, (tuple, list)):
        for item in value:
            if isinstance(item, torch.Tensor):
                return item
    return None


class TorchSubjectModel(SubjectModel):
    """Wrap a ``torch.nn.Module`` (eval mode, host-resident) as a SubjectModel.

    Parameters
    ----------
    module : the torch module. Put it in ``eval()`` and load weights before
        wrapping; the adapter calls it under ``torch.no_grad()``.
    channels_last : if True (default), ``apply`` receives NHWC batches (the
        framework convention), transposes to NCHW for torch, and transposes
        rank-4 taps back to NHWC. Set False for models that natively take
        the layout you feed.
    name : stable cache-identity name (reference ``model.name`` contract);
        falls back to the torch class name.
    """

    def __init__(self, module, *, channels_last: bool = True, name: str | None = None):
        import torch  # deferred: the package must import without torch

        self._torch = torch
        self.module = module.eval()
        # Feed the module its own parameter dtype (fp16/bf16/double modules
        # reject float32 input); captures are cast back to float32.
        first_param = next(module.parameters(), None)
        self._in_dtype = first_param.dtype if first_param is not None else torch.float32
        self.channels_last = channels_last
        self.module_names = tuple(n for n, _ in module.named_modules() if n)
        self.params: dict = {}
        self.name = name or type(module).__name__
        # (input shape, input dtype name, tap_names) -> ShapeDtypeStructs
        self._shape_cache: dict[tuple, tuple] = {}

    def init(self, rng) -> dict:
        """Weights live inside the torch module — there is nothing to init."""
        return {}

    # ----------------------------------------------------------------- host fn
    def _host_forward(self, x: np.ndarray, tap_names: tuple[str, ...]):
        """Run the torch forward with hooks; returns (output, taps...) numpy."""
        torch = self._torch
        if self.channels_last and x.ndim == 4:
            x = x.transpose(0, 3, 1, 2)
        captured: dict[str, np.ndarray] = {}
        handles = []

        def make_hook(tap_name):
            def hook(_mod, _inputs, output):
                tensor = _first_tensor(output, torch)
                if tensor is None:
                    raise TypeError(
                        f"module '{tap_name}' produced no tensor output to tap"
                    )
                arr = tensor.detach().float().cpu().numpy()
                if self.channels_last and arr.ndim == 4:
                    arr = arr.transpose(0, 2, 3, 1)
                captured[tap_name] = np.ascontiguousarray(arr, np.float32)

            return hook

        modules = dict(self.module.named_modules())
        try:
            for tap_name in tap_names:
                handles.append(modules[tap_name].register_forward_hook(make_hook(tap_name)))
            with torch.no_grad():
                xt = torch.from_numpy(np.ascontiguousarray(x, np.float32)).to(self._in_dtype)
                out = self.module(xt)
        finally:
            for h in handles:
                h.remove()
        out_tensor = _first_tensor(out, torch)
        out_np = (
            np.ascontiguousarray(out_tensor.detach().float().cpu().numpy(), np.float32)
            if out_tensor is not None
            else np.zeros((x.shape[0], 1), np.float32)  # tap-only models
        )
        missing = [t for t in tap_names if t not in captured]
        if missing:
            raise KeyError(
                f"taps {missing} never fired — these modules are not reached by "
                "this input's forward path"
            )
        return (out_np, *(captured[t] for t in tap_names))

    def _result_shapes(self, shape, dtype, tap_names: tuple[str, ...]):
        """Shapes for ``pure_callback``, discovered by ONE real host forward
        on zeros per (input shape, taps) — cached, and reused by
        ``jax.eval_shape`` (the engine's cost-free latent-count probe)."""
        key = (tuple(shape), np.dtype(dtype).name, tap_names)
        if key not in self._shape_cache:
            probe = self._host_forward(np.zeros(shape, np.float32), tap_names)
            self._shape_cache[key] = tuple(
                jax.ShapeDtypeStruct(a.shape, a.dtype) for a in probe
            )
        return self._shape_cache[key]

    def _reject_interventions(self):
        """The torch forward runs opaquely on the host — JAX intervention
        closures cannot rewrite its internal activations. Silent no-ops here
        would fabricate all-zero causal results, so refuse loudly."""
        from semanticlens_tpu.models.base import has_intervention

        targeted = [n for n in self.module_names if has_intervention(n)]
        if targeted:
            raise NotImplementedError(
                f"interventions on TorchSubjectModel modules {targeted} are not "
                "supported (the torch forward is a host callback; rewrites "
                "cannot feed it). Port the subject to a native JAX family for "
                "causal analysis."
            )

    # ------------------------------------------------------------------- apply
    def apply(self, params: Mapping, x, tap_names: Sequence[str] = ()):
        """(B, H, W, C) float → (output, {name: activation}); traceable.

        Under ``jit`` the forward lowers to a host callback — the surrounding
        program (preprocess before, aggregate/top-k/embed after) still fuses
        and stays on device.
        """
        tap_names = tuple(tap_names)
        self._reject_interventions()
        shapes = self._result_shapes(x.shape, x.dtype, tap_names)
        flat = jax.pure_callback(
            lambda xs: self._host_forward(np.asarray(xs), tap_names),
            shapes,
            jnp.asarray(x, jnp.float32),
        )
        out, *taps = flat
        return out, dict(zip(tap_names, taps))

    def __repr__(self):
        return f"TorchSubjectModel({type(self.module).__name__}, n_modules={len(self.module_names)})"
