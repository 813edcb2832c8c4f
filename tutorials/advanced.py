"""Advanced tour: real files, meshes, crash-safety, search, multi-host.

Runs end-to-end on CPU (forces a virtual 8-device mesh) in ~2-3 minutes:

    JAX_PLATFORMS=cpu python tutorials/advanced.py

Covers what the quickstart skips: on-disk datasets through the native
decoder, sharded fused Collect+Embed with mid-sweep checkpoints, streaming
top-k text search, and the multi-host recipe.
"""

import sys
import tempfile
from pathlib import Path

# Runnable from a source checkout without installation.
_repo = Path(__file__).resolve().parent.parent
if str(_repo) not in sys.path:
    sys.path.insert(0, str(_repo))

import numpy as np
from PIL import Image

import jax

# Self-provision a virtual 8-device CPU mesh when run on a small host (the
# same switch the test conftest uses; must happen before any device is used).
try:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass
if jax.device_count() < 8:
    raise SystemExit(f"need >= 8 devices for the mesh demo, have {jax.device_count()}")

import jax.numpy as jnp
from jax.sharding import Mesh

import semanticlens_tpu as sl
from semanticlens_tpu.collect import ActivationComponentVisualizer
from semanticlens_tpu.data import ImageFolder
from semanticlens_tpu.data.native_decoder import is_available as native_decoder_available
from semanticlens_tpu.foundation_models import OpenClip
from semanticlens_tpu.models import ResNet
from semanticlens_tpu.ops.aggregators import aggregate_conv_mean
from semanticlens_tpu.scores import topk_cosine_search

# --- 1. A real on-disk dataset (JPEGs) -------------------------------------
root = Path(tempfile.mkdtemp(prefix="sl-advanced-")) / "data"
rng = np.random.default_rng(0)
for cls in ("stripes", "blobs"):
    (root / cls).mkdir(parents=True)
    for i in range(16):
        img = rng.integers(0, 255, size=(96, 128, 3), dtype=np.uint8)
        Image.fromarray(img).save(root / cls / f"{i:03d}.jpg", quality=92)

dataset = ImageFolder(root, image_size=64)  # native C++ decode when available
print(f"dataset: {dataset} (native decoder: {native_decoder_available()})")

# --- 2. Mesh-sharded fused pipeline with crash-safety -----------------------
mesh = Mesh(np.array(jax.devices()[:8]), axis_names=("data",))
model = ResNet(depth=18, num_classes=10, dtype=jnp.float32)
model.params = model.init(jax.random.PRNGKey(0))
model.name = "advanced-r18"

cache = root.parent / "cache"
cv = ActivationComponentVisualizer(
    model=model,
    dataset_model=dataset,
    dataset_fm=dataset,  # same raw images → single fused pass
    layer_names=["layer4"],
    num_samples=5,
    aggregate_fn=aggregate_conv_mean,
    cache_dir=str(cache),
    mesh=mesh,
    model_preprocess=lambda x: x.astype(jnp.float32) / 255.0,
)
fm = OpenClip("ViT-B-32", dtype=jnp.float32)  # pass checkpoint=/bpe_path= for real weights
lens = sl.Lens(fm)

# checkpoint= flushes the running state + embedding rows every N samples;
# an interrupted run resumes from the last flush (kill and re-run to see).
concept_db = lens.compute_concept_db(cv, batch_size=8, checkpoint=16)
print("concept DB:", {k: np.asarray(v).shape for k, v in concept_db.items()})

# --- 3. Scores + streaming search -------------------------------------------
agg_db = {k: np.asarray(v, np.float32).mean(1) for k, v in concept_db.items()}
clarity = lens.eval_clarity(concept_db)
print("clarity[layer4] mean:", float(np.asarray(clarity["layer4"]).mean()))

q = np.asarray(fm.encode_text(fm.tokenize(["striped pattern"])), np.float32)
vals, idx = topk_cosine_search(q, agg_db["layer4"], k=3)
print("top-3 'striped pattern' neurons:", np.asarray(idx)[0].tolist())

# --- 4. Multi-host (DCN) recipe ----------------------------------------------
# On an N-process slice (after jax.distributed.initialize), replace the
# engine sweep with:
#
#   from semanticlens_tpu.parallel import collect_multihost
#   states, n = collect_multihost(cv.engine, model.params, dataset, batch_size)
#
# Each process streams only its own dataset shard; the single cross-host
# exchange is the kilobyte-scale top-k state merge. See tests/test_multihost.py
# for a real 2-process run. The fused variant (fused_multihost) additionally
# exchanges only the embedding rows the merged top-k selected.

# --- 4b. Grain-backed input (multi-host-ready, worker decode) ---------------
# The same engine consumes a Grain pipeline: this host's even_split shard of
# any random-access source, decoded by grain worker processes, with
# deterministic global sample ids. Source here: the in-memory images.
from semanticlens_tpu.data.grain_adapter import GrainShardDataset

raw_images = np.stack([dataset[i][0] if isinstance(dataset[i], tuple) else dataset[i]
                       for i in range(len(dataset))])
grain_ds = GrainShardDataset(
    raw_images,
    name="grain-demo",
    worker_count=0,  # >0 spawns decode processes (needs a picklable transform)
)
grain_states, n_grain = cv.engine.run(model.params, grain_ds, batch_size=8)
print("grain sweep:", n_grain, "samples,", grain_states["layer4"].ids.shape)

# --- 4c. Name components with soft-WPMI (CLIP-Dissect) ----------------------
# Cosine labels from the MEAN concept vector; WPMI scores words against the
# component's actual top-activating images (robust for polysemantic units).
named = lens.label_components(
    ["stripes", "dog", "sky"], agg_db, top_m=2,
    scoring="wpmi",
    evidence_ids={name: cv.get_max_reference(name) for name in agg_db},
    image_embeds=cv.embedding_table,
)
for layer, (words, w_scores) in named.items():
    print(f"wpmi labels {layer}[0]:", words[0])

# --- 4d. Dissect the foundation model itself --------------------------------
# Every CLIP MLP neuron writes a DIRECTION into the joint space; name the
# most nameable ones with the same labeling machinery (logit-lens
# linearization, causally validated in tests/foundation_models/test_dissect.py).
from semanticlens_tpu.foundation_models import mlp_neuron_directions

last_block = fm.cfg.vision.layers - 1
dirs = mlp_neuron_directions(fm.params, fm.cfg, last_block)  # (4*width, D)
named_neurons = lens.label_components(
    ["stripes", "dog", "sky"], dirs, top_m=1,
)
n_words, n_scores = named_neurons
best = int(np.argmax(n_scores[:, 0]))
print(f"most nameable FM neuron in block {last_block}: #{best} -> {n_words[best][0]}")

# --- 4e. Bring your own torch model ------------------------------------------
# Any torch.nn.Module works as a subject (the reference's hooks promise):
# the torch forward runs on the host behind jax.pure_callback; aggregation,
# top-k, and embedding stay on device. Every named_modules() entry taps.
import torch
from torch import nn

from semanticlens_tpu.models import TorchSubjectModel

torch_net = nn.Sequential(
    nn.Conv2d(3, 8, 3, padding=1), nn.ReLU(), nn.Conv2d(8, 16, 3, padding=1), nn.ReLU()
).eval()
torch_subject = TorchSubjectModel(torch_net, name="my-torch-net")
torch_cv = ActivationComponentVisualizer(
    model=torch_subject, dataset_model=dataset, dataset_fm=dataset,
    layer_names=["3"], num_samples=4, aggregate_fn=aggregate_conv_mean,
    cache_dir=None,
)
torch_cache = torch_cv.run(batch_size=8)
print("torch subject top-k:", torch_cache["3"].activations.shape)

# --- 4f. Causally validate the evidence (ablate-and-measure) -----------------
# The Collect stage is correlational; the causal module tests whether a
# component is load-bearing exactly where its evidence says it fires.
# Every family supports interventions through the tap contract.
from semanticlens_tpu import causal

top_neuron = int(np.asarray(idx)[0][0])
evidence_ids = np.asarray(cv.get_max_reference("layer4")[top_neuron])
evidence_ids = evidence_ids[evidence_ids >= 0]
ev_imgs = jnp.asarray(
    np.stack([dataset[int(i)][0] for i in evidence_ids]), jnp.float32) / 255.0
ct_imgs = jnp.asarray(
    np.stack([dataset[int(i)][0] for i in rng.choice(len(dataset), evidence_ids.size,
                                                     replace=False)]), jnp.float32) / 255.0
ratio = causal.necessity_ratio(model, model.params, "layer4", [top_neuron],
                               ev_imgs, ct_imgs)
print(f"necessity ratio of neuron {top_neuron} on its own evidence:",
      round(float(np.asarray(ratio)[0]), 3))
# Also available: causal.ablation_effects (whole-layer knockout profiles in
# ONE vmapped program), causal.activation_patch (interchange interventions),
# causal.steer (concept-direction steering). tools/causal_audit.py runs the
# full collect -> ablate -> report loop from the command line.

# --- 4g. Synthesize concept examples (dataset-free Collect) ------------------
# When a component's concept is missing from the probe dataset, create the
# evidence instead: batched feature visualization — K canvases ascend K
# components per compiled program — feeding the same Embed/Analyze path.
from semanticlens_tpu.collect import SynthesisComponentVisualizer
from semanticlens_tpu.featviz import SynthesisConfig

syn = SynthesisComponentVisualizer(
    model, ["layer4"], {"layer4": 4}, num_samples=2,
    aggregate_fn=aggregate_conv_mean, image_size=64,
    model_preprocess=lambda x: x.astype(jnp.float32) / 255.0,
    config=SynthesisConfig(steps=32, jitter=2),  # demo-sized; default is 256
    cache_dir=str(cache),
)
syn_db = lens.compute_concept_db(syn, batch_size=8)
print("synthesized concept DB:", {k: np.asarray(v).shape for k, v in syn_db.items()})
print("synthesis objectives (first component):", np.round(syn.objectives["layer4"][0], 3))

# --- 4h. Int8 towers (opt-in W8A8 inference) ---------------------------------
# quantize="int8" on OpenClip / SigLipV2 / ClipMobile (and ResNet subjects)
# puts the tower's matmuls/convs on the MXU's 2x-rate int8 path — measured
# 1.11x on the full fused pipeline with both towers quantized, embedding
# cosine >= 0.9995 (docs/PERF_NOTES.md). Quantized towers segregate their
# caches automatically (the name gains -int8), so float and int8 concept
# DBs never mix. Defaults stay bf16: int8 can reorder near-tied top-k picks.
fm_int8 = OpenClip("ViT-B-32", dtype=jnp.float32, seed=0, quantize="int8")
emb8 = np.asarray(fm_int8.encode_image(fm_int8.preprocess(raw_images[:4])))
embf = np.asarray(fm.encode_image(fm.preprocess(raw_images[:4])))
cos8 = (emb8 * embf).sum(-1) / (
    np.linalg.norm(emb8, axis=-1) * np.linalg.norm(embf, axis=-1)
)
print("int8 tower:", fm_int8.name, "cosine vs float:", np.round(cos8.min(), 4))

# --- 5. Serve the concept DB -------------------------------------------------
from semanticlens_tpu.serve import SearchService, serve

service = SearchService(fm, agg_db)  # warms the query path at construction
hits = service.text_search("striped pattern", k=3)
print("served top-3:", hits["layer4"]["ids"])
server, thread = serve(service, port=0, background=True)  # HTTP endpoints
import json
import urllib.request

with urllib.request.urlopen(
    f"http://127.0.0.1:{server.server_address[1]}/healthz", timeout=10
) as r:
    print("healthz:", json.loads(r.read()))
server.shutdown(); server.server_close()

print("advanced tour OK")
