"""semanticlens_tpu: TPU-native mechanistic interpretability of vision models.

A from-scratch JAX/XLA re-design of the SemanticLens capability set
(reference: jim-berend/semanticlens): map the components of a subject model
into the joint image–text space of a vision-language foundation model, then
search and audit them with natural language.

Workflow (same three stages as the reference, README.md:46-53):

1. **Collect** — ``ActivationComponentVisualizer`` streams the dataset through
   a tapped subject model; per-component top-k example selection runs fused
   on device (optionally sharded over a TPU mesh).
2. **Embed** — ``foundation_models.OpenClip`` / ``SigLipV2`` encode the
   dataset with on-device preprocessing; ``Lens.compute_concept_db`` caches
   the result in the reference's safetensors format.
3. **Analyze** — ``scores`` (clarity / redundancy / polysemanticity) and
   text/image probing as jitted matmul/reduction programs.
"""

from semanticlens_tpu import (
    causal,
    collect,
    core,
    data,
    foundation_models,
    models,
    ops,
    parallel,
    relevance,
    sae,
    scores,
    utils,
)
from semanticlens_tpu.lens import Lens
from semanticlens_tpu.scores import clarity_score, polysemanticity_score, redundancy_score

__all__ = [
    "causal",
    "collect",
    "core",
    "data",
    "foundation_models",
    "models",
    "ops",
    "parallel",
    "relevance",
    "sae",
    "scores",
    "utils",
    "Lens",
    "clarity_score",
    "polysemanticity_score",
    "redundancy_score",
]

__version__ = "0.5.0"
