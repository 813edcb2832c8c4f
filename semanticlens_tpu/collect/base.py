"""Abstract base class for component visualizers.

Defines the interface every Collect strategy implements — run, concept-DB
computation, max-reference lookup, metadata/caching/storage contract —
mirroring the reference ABC
(reference: semanticlens/component_visualization/base.py:16-183) minus the
torch device plumbing (JAX manages placement; ``to``/``device`` survive as
no-op compatibility shims).
"""

from __future__ import annotations

from abc import ABC, abstractmethod


class AbstractComponentVisualizer(ABC):
    """Identifies the concept examples encoded by a model's components."""

    @abstractmethod
    def run(self, *args, **kwargs):
        """Process the dataset to find per-component concept examples."""
        raise NotImplementedError

    @abstractmethod
    def _compute_concept_db(self, fm, **kwargs) -> dict:
        """Embed each component's concept examples with foundation model ``fm``.

        Returns ``{layer_name: (n_components, n_samples, embedding_dim)}``.
        """
        raise NotImplementedError

    @abstractmethod
    def get_max_reference(self, layer_name):
        """(n_components, n_samples) dataset indices of top examples."""
        raise NotImplementedError

    @property
    def metadata(self) -> dict[str, str]:
        raise NotImplementedError

    @property
    @abstractmethod
    def caching(self) -> bool:
        raise NotImplementedError

    @property
    @abstractmethod
    def storage_dir(self):
        raise NotImplementedError

    # Torch-API compatibility shims: JAX arrays don't carry a mutable device.
    @property
    def device(self):
        return None

    def to(self, device):
        return self
