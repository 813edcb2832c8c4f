"""Quickstart: the three-stage SemanticLens workflow on TPU.

Mirror of the reference's tutorials/quickstart.ipynb, runnable offline
(random weights, synthetic data). Swap in real checkpoints via
``model.load_torch_state_dict`` / ``OpenClip(checkpoint=..., bpe_path=...)``.

Run:  python tutorials/quickstart.py
"""

import sys
from pathlib import Path

# Runnable from a source checkout without installation.
_repo = Path(__file__).resolve().parent.parent
if str(_repo) not in sys.path:
    sys.path.insert(0, str(_repo))

import numpy as np

import jax
import jax.numpy as jnp

import semanticlens_tpu as sl
from semanticlens_tpu.collect import ActivationComponentVisualizer
from semanticlens_tpu.data import ArrayDataset
from semanticlens_tpu.foundation_models import OpenClip
from semanticlens_tpu.models import ResNet
from semanticlens_tpu.ops.aggregators import aggregate_conv_mean
from semanticlens_tpu.utils import make_preprocess_fn, setup_colored_logging


def main():
    setup_colored_logging("INFO")

    # --- Subject model -------------------------------------------------------
    model = ResNet(depth=18, num_classes=1000, dtype=jnp.float32)
    model.params = model.init(jax.random.PRNGKey(0))
    model.name = "resnet18-demo"

    # --- Data: one raw uint8 dataset for both models (fused pipeline) --------
    rng = np.random.default_rng(0)
    images = rng.integers(0, 255, size=(128, 96, 96, 3), dtype=np.uint8)
    dataset = ArrayDataset(images, name="synthetic-128")

    # --- Stage 1+2: Collect + Embed ------------------------------------------
    cv = ActivationComponentVisualizer(
        model=model,
        dataset_model=dataset,
        dataset_fm=dataset,
        layer_names=["layer3", "layer4"],
        num_samples=9,
        aggregate_fn=aggregate_conv_mean,
        model_preprocess=make_preprocess_fn(size=96, crop=96),
        cache_dir="quickstart_cache",
    )
    fm = OpenClip("ViT-B-32", dtype=jnp.float32)  # random weights offline
    lens = sl.Lens(fm)
    concept_db = lens.compute_concept_db(cv, batch_size=32)
    print("concept DB:", {k: np.asarray(v).shape for k, v in concept_db.items()})

    # --- Stage 3: Analyze -----------------------------------------------------
    agg_db = {k: np.asarray(v).mean(1) for k, v in concept_db.items()}
    hits = lens.text_probing("dog", agg_db, templates=["a photo of a {}"])
    top = int(np.asarray(hits["layer4"]).argmax())
    print(f"top 'dog' neuron in layer4: {top}")

    clarity = lens.eval_clarity(concept_db)
    print("mean clarity layer4:", float(np.asarray(clarity["layer4"]).mean()))
    poly = lens.eval_polysemanticity({"layer4": np.asarray(concept_db["layer4"])[:16]})
    print("polysemanticity (first 16):", np.asarray(poly["layer4"])[:4])

    # --- Visualize a component's concept examples ----------------------------
    cv.visualize_components(np.array([0, 1]), layer_name="layer4", n_samples=4)


if __name__ == "__main__":
    main()
