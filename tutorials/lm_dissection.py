"""Dissecting a LANGUAGE model — the vision workflow, verbatim, on text.

Executable end-to-end demo (CPU, random weights — pass real checkpoints
for meaningful concepts): a GPT-2 subject streams token batches through
the standard collect engine; evidence STRINGS embed through the foundation
model's text tower; probing, CLIP-Dissect naming, clarity, causal
validation, and SAE-latent audits apply to LM neurons unchanged.

Run:  PYTHONPATH=. python tutorials/lm_dissection.py
"""

import sys
from pathlib import Path

_repo = Path(__file__).resolve().parent.parent
if str(_repo) not in sys.path:
    sys.path.insert(0, str(_repo))

import jax

jax.config.update("jax_platforms", "cpu")  # demo-sized; keep it off the TPU

import tempfile

import jax.numpy as jnp
import numpy as np

import semanticlens_tpu as sl
from semanticlens_tpu.collect import (
    TextActivationComponentVisualizer,
    TextSAEComponentVisualizer,
    TokenTextDataset,
)
from semanticlens_tpu.foundation_models import OpenClip
from semanticlens_tpu.models import GPT2
from semanticlens_tpu.sae import SAEConfig

cache = Path(tempfile.mkdtemp(prefix="sl-lm-"))
rng = np.random.default_rng(0)

# --- 1. A toy corpus + a small GPT-2 subject ---------------------------------
# Real use: tokenize your corpus with the LM's own tokenizer —
# TokenTextDataset.from_texts pads/truncates (tail-keeping) and pairs the
# raw strings. Give the SUBJECT the same pad_id so pad runs are masked out
# of attention and padded rows produce exactly the unpadded activations.
TOPICS = ["a cat sleeping", "a red car", "fresh bread", "a wooden chair", "heavy rain"]
texts = [f"{TOPICS[i % 5]} appears in sentence {i}" for i in range(48)]
V, T, PAD = 160, 16, 159
ds = TokenTextDataset.from_texts(
    texts, lambda t: [ord(c) % V for c in t], T,  # stand-in tokenizer
    pad="left", pad_id=PAD, name="toy-corpus")
tokens = ds.images

lm = GPT2(vocab_size=V, n_positions=T, width=64, depth=2, heads=4, dtype=jnp.float32,
          pad_id=PAD)
lm.params = lm.init(jax.random.PRNGKey(0))  # or: lm.load_torch_state_dict(hf.state_dict())
lm.name = "toy-gpt2"

# --- 2. Collect + Embed through the Lens (text tower) ------------------------
LAYER = "transformer.h.1.mlp.act"  # MLP neurons, the classic LM dissection target
cv = TextActivationComponentVisualizer(
    model=lm,
    dataset_model=ds,              # token rows → collect engine
    dataset_fm=ds.texts_view(),    # raw strings → FM text tower
    layer_names=[LAYER],
    num_samples=5,
    cache_dir=str(cache),
)
fm = OpenClip("ViT-B-32", dtype=jnp.float32)  # pass checkpoint=/bpe_path= for real weights
lens = sl.Lens(fm)
concept_db = lens.compute_concept_db(cv, batch_size=16)
print("concept DB:", {k: np.asarray(v).shape for k, v in concept_db.items()})

# --- 3. Analyze: search, name, and score LM neurons --------------------------
agg_db = {k: np.asarray(v, np.float32).mean(1) for k, v in concept_db.items()}
hits = lens.text_probing("a sleeping cat", agg_db)
best = int(np.argmax(np.asarray(hits[LAYER])))
print(f"neuron most aligned with 'a sleeping cat': #{best}")
print("its evidence:", [t for t in cv.get_max_reference_texts(LAYER)[best] if t][:3])

labels = lens.label_components(TOPICS, agg_db, scoring="wpmi",
                               evidence_ids={LAYER: cv.get_max_reference(LAYER)},
                               image_embeds=cv.embedding_table)
words, _scores = labels[LAYER]
print("top label for neuron 0:", words[0][0])
clarity = lens.eval_clarity(concept_db)
print("clarity mean:", float(np.nanmean(np.asarray(clarity[LAYER]))))
print(cv.visualize_components([best], LAYER, n_samples=3))

# --- 4. Causal validation (ablate-and-measure on token batches) --------------
from semanticlens_tpu import causal

ev = cv.get_max_reference(LAYER)[best]
ev = ev[ev >= 0]
ctl = rng.choice(len(ds), size=ev.size, replace=False)
ratio = causal.necessity_ratio(lm, lm.params, LAYER, [best],
                               jnp.asarray(tokens[ev]), jnp.asarray(tokens[ctl]))
print(f"necessity ratio of neuron {best} on its own evidence:",
      round(float(np.asarray(ratio)[0]), 3))

# --- 4b. WHERE in the text does the neuron fire? (token-level LRP) -----------
from semanticlens_tpu.relevance.text import highlight_evidence, token_relevance

ev_rel = token_relevance(lm, lm.params, jnp.asarray(tokens[ev[:2]]), LAYER, best)
tok_strings = [[chr(c) if c else "_" for c in row] for row in tokens[ev[:2]]]
print("relevance-highlighted evidence (token-level LRP):")
for line in highlight_evidence(tok_strings, np.asarray(ev_rel), threshold=0.6):
    print("  ", line)

# --- 4c. Same workflow on a MODERN decoder (Llama: RMSNorm/RoPE/GQA/SwiGLU) --
# HF LlamaForCausalLM names carry over: dissect gate/up/act/down channels or
# attention heads ("model.layers.N.self_attn.heads"). Real use:
#   llm = Llama.from_name("llama-3.2-1b"); llm.load_torch_state_dict(sd)
from semanticlens_tpu.models import Llama

llm = Llama(vocab_size=V, n_positions=T, width=64, depth=2, heads=4,
            kv_heads=2, intermediate=96, dtype=jnp.float32, pad_id=PAD)
llm.params, llm.name = llm.init(jax.random.PRNGKey(1)), "toy-llama"
L_LAYER = "model.layers.1.mlp.act_fn"
llama_cv = TextActivationComponentVisualizer(
    model=llm, dataset_model=ds, dataset_fm=ds.texts_view(),
    layer_names=[L_LAYER], num_samples=5, cache_dir=str(cache))
llama_db = lens.compute_concept_db(llama_cv, batch_size=16)
l_best = int(np.argmax(np.asarray(lens.text_probing("a sleeping cat", {
    k: np.asarray(v, np.float32).mean(1) for k, v in llama_db.items()})[L_LAYER])))
l_rel = token_relevance(llm, llm.params, jnp.asarray(tokens[:1]), L_LAYER, l_best)
print(f"llama SwiGLU channel most aligned with 'a sleeping cat': #{l_best}; "
      f"token relevance finite: {bool(np.isfinite(np.asarray(l_rel)).all())}")

# --- 5. SAE latents as components (same pipeline, virtual tap) ----------------
cfg = SAEConfig(d_in=4 * 64, n_latents=48, k=4, positions_per_image=4, batch_rows=64)
sae_params = TextSAEComponentVisualizer.train(lm, ds, LAYER, cfg, batch_size=16)
sae_cv = TextSAEComponentVisualizer(lm, ds, ds.texts_view(), LAYER, sae_params,
                                    num_samples=5, cache_dir=str(cache))
sae_db = lens.compute_concept_db(sae_cv, batch_size=16)
print("SAE-latent concept DB:", {k: np.asarray(v).shape for k, v in sae_db.items()})

# --- 6. Transcoders: sparse replacement of the MLP's computation --------------
# Train encode-from-ln_2 / decode-toward-mlp dictionaries (the circuit-
# analysis primitive); replace=True patches the MLP with the transcoder to
# measure fidelity, and interventions on the code tap are causal.
from semanticlens_tpu.sae import TranscoderSubjectModel, train_transcoder_on_layer

tc_cfg = SAEConfig(d_in=64, d_out=64, n_latents=96, k=6, lr=1e-2,
                   batch_rows=64, skip=True, seed=0)
tc, _, tc_metrics = train_transcoder_on_layer(
    lm, lm.params, ds, "transformer.h.1.ln_2", "transformer.h.1.mlp",
    tc_cfg, batch_size=16, epochs=10)

# The transcoder-quality metric that matters: how much do the LOGITS move
# when the MLP is replaced by the transcoder, relative to ablating the MLP?
# Demo caveat: a RANDOM-init toy's MLP output is unstructured noise, so this
# ratio stays >1 here; on a learnable map the same machinery reaches
# fvu < 0.15 (tests/test_sae.py::test_transcoder_learns_nonlinear_map), and
# on real subjects with real corpora the ratio is what you tune toward 0.
from semanticlens_tpu.models.base import interventions

patched = TranscoderSubjectModel(lm, "transformer.h.1.ln_2", "transformer.h.1.mlp",
                                 tc, base_params=lm.params, replace=True)
base_logits, _ = lm.apply(lm.params, jnp.asarray(tokens[:4]))
patched_logits, taps = patched.apply(
    patched.params, jnp.asarray(tokens[:4]), tap_names=("transformer.h.1.ln_2.tc",))
with interventions({"transformer.h.1.mlp": lambda v: jnp.zeros_like(v)}):
    zeroed_logits, _ = lm.apply(lm.params, jnp.asarray(tokens[:4]))
patch_mse = float(jnp.mean((patched_logits - base_logits) ** 2))
zero_mse = float(jnp.mean((zeroed_logits - base_logits) ** 2))
print(f"patched-model logit mse {patch_mse:.4f} vs MLP-zeroed {zero_mse:.4f} "
      f"(ratio {patch_mse / zero_mse:.2f}; see caveat above) | codes:",
      taps["transformer.h.1.ln_2.tc"].shape)

print("done — artifacts under", cache)
