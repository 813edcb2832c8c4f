"""Whole-stack system test: disk JPEGs → mesh collect+embed → analyze → render.

One test that exercises the production path end to end on the virtual
8-device CPU mesh, the way a user would drive it: an ImageFolder of real
JPEG files (native decoder when available), a ResNet subject model, a CLIP
foundation model with a real (tiny) BPE vocabulary discovered from
$SEMANTICLENS_ASSETS, fused Collect+Embed through the Lens cache, all three
scores, text probing, streaming top-k search, component grids, and a second
Lens call served entirely from the on-disk caches.
"""

import gzip

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

import semanticlens_tpu as sl
from semanticlens_tpu.collect import ActivationComponentVisualizer
from semanticlens_tpu.data import ImageFolder
from semanticlens_tpu.foundation_models import OpenClip
from semanticlens_tpu.foundation_models.tokenizer import ClipBpeTokenizer
from semanticlens_tpu.models import ResNet
from semanticlens_tpu.ops.aggregators import aggregate_conv_mean
from semanticlens_tpu.scores import topk_cosine_search


@pytest.fixture()
def image_root(tmp_path):
    rng = np.random.default_rng(0)
    for cls in ("alpha", "beta"):
        d = tmp_path / "data" / cls
        d.mkdir(parents=True)
        for i in range(12):
            base = rng.integers(0, 200, size=(80, 96, 3), dtype=np.uint8)
            Image.fromarray(base).save(d / f"{cls}{i:02d}.jpg", quality=92)
    return tmp_path / "data"


@pytest.fixture()
def bpe_assets(tmp_path, monkeypatch):
    merges = [("d", "o"), ("do", "g</w>"), ("c", "a"), ("ca", "t</w>")]
    lines = ["test vocab"] + [f"{a} {b}" for a, b in merges]
    with gzip.open(tmp_path / "bpe_simple_vocab_16e6.txt.gz", "wt") as f:
        f.write("\n".join(lines))
    monkeypatch.setenv("SEMANTICLENS_ASSETS", str(tmp_path))
    return tmp_path


def test_full_stack_on_mesh(image_root, bpe_assets, tmp_path):
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()[:8]), axis_names=("data",))

    model = ResNet(depth=18, num_classes=10, dtype=jnp.float32)
    model.params = model.init(jax.random.PRNGKey(0))
    model.name = "sys-r18"

    dataset = ImageFolder(image_root, image_size=64)
    assert len(dataset) == 24

    fm = OpenClip("ViT-B-32", dtype=jnp.float32)
    assert isinstance(fm.tokenizer, ClipBpeTokenizer), "asset discovery must engage"
    lens = sl.Lens(fm)

    cache_root = tmp_path / "cache"
    cv = ActivationComponentVisualizer(
        model=model,
        dataset_model=dataset,
        dataset_fm=dataset,
        layer_names=["layer3", "layer4"],
        num_samples=5,
        aggregate_fn=aggregate_conv_mean,
        cache_dir=str(cache_root),
        mesh=mesh,
        model_preprocess=lambda x: x.astype(jnp.float32) / 255.0,
    )

    # --- fused Collect+Embed through the Lens cache -------------------------
    concept_db = lens.compute_concept_db(cv, batch_size=8)
    assert set(concept_db) == {"layer3", "layer4"}
    db4 = np.asarray(concept_db["layer4"], np.float32)
    assert db4.shape == (512, 5, 512) and np.isfinite(db4).all()

    # sample ids must be valid dataset indices (global, mesh-merged)
    ids = np.asarray(cv.get_max_reference("layer4"))
    real = ids[ids >= 0]
    assert real.size and (real < 24).all()

    # --- analyze -------------------------------------------------------------
    agg_db = {k: np.asarray(v, np.float32).mean(1) for k, v in concept_db.items()}
    clarity = lens.eval_clarity(concept_db)
    assert np.isfinite(np.asarray(clarity["layer4"])).all()
    redundancy = lens.eval_redundancy(agg_db)
    assert np.isfinite(float(np.asarray(redundancy["layer4"])))
    poly = lens.eval_polysemanticity({"layer4": concept_db["layer4"][:16]})
    assert np.asarray(poly["layer4"]).shape == (16,)

    # --- search: template probing + streaming top-k -------------------------
    hits = lens.text_probing(["dog", "cat"], agg_db, templates=["a photo of a {}"])
    assert np.asarray(hits["layer4"]).shape == (2, 512)
    q = np.asarray(fm.encode_text(fm.tokenize(["dog"])), np.float32)
    vals, idx = topk_cosine_search(q, agg_db["layer4"], k=3, chunk_size=100)
    dense = np.asarray(sl.scores.cosine_probe(q, agg_db["layer4"]))
    assert int(np.asarray(idx)[0, 0]) == int(dense[0].argmax()), (
        "streaming search disagrees with dense probe"
    )

    # --- render --------------------------------------------------------------
    fpath = cv.visualize_components([0, 1], layer_name="layer4", n_samples=4)
    assert fpath is not None and fpath.exists()

    # --- cache round trip: a fresh Lens+CV serves everything from disk ------
    cv2 = ActivationComponentVisualizer(
        model=model,
        dataset_model=dataset,
        dataset_fm=dataset,
        layer_names=["layer3", "layer4"],
        num_samples=5,
        aggregate_fn=aggregate_conv_mean,
        cache_dir=str(cache_root),
        mesh=mesh,
        model_preprocess=lambda x: x.astype(jnp.float32) / 255.0,
    )
    db_again = sl.Lens(fm).compute_concept_db(cv2, batch_size=8)
    np.testing.assert_array_equal(np.asarray(db_again["layer4"], np.float32), db4)
