"""End-to-end language-model audit: collect → name → score → validate.

Text analogue of tools/full_audit.py (beyond-reference capability): dissect
a GPT-2 subject's MLP neurons (or attention heads via --layer
"transformer.h.N.attn.heads" — ablating a head's score zeroes its
residual-stream contribution, models/layers.attn_out_projection) over a
synthetic topic corpus, embed the evidence strings with a foundation
model's text tower, CLIP-Dissect-name the components against the topic
vocabulary, score clarity, causally validate the top component
(ablate-and-measure), and attribute it to tokens (LRP). Prints one JSON
line per stage.

Usage:
  python tools/lm_audit.py --depth 2 --width 64 --layer transformer.h.1.mlp.act
  python tools/lm_audit.py --cpu --samples 64          # tunnel down / no TPU
"""

from __future__ import annotations

import sys
from pathlib import Path

_repo = Path(__file__).resolve().parent.parent
if str(_repo) not in sys.path:
    sys.path.insert(0, str(_repo))

import argparse
import json
import time

import numpy as np

TOPICS = ["a sleeping cat", "a red car", "fresh bread", "a wooden chair", "heavy rain"]


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n", 1)[0])
    ap.add_argument("--width", type=int, default=64)
    ap.add_argument("--depth", type=int, default=2)
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--layer", default="")
    ap.add_argument("--samples", type=int, default=96)
    ap.add_argument("--seq-len", type=int, default=16)
    ap.add_argument("--evidence", type=int, default=5)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    ap.add_argument("--family", default="gpt2", choices=["gpt2", "llama", "gemma2"],
                    help="subject architecture (HF naming conventions)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from semanticlens_tpu import Lens, causal
    from semanticlens_tpu.collect import TextActivationComponentVisualizer, TokenTextDataset
    from semanticlens_tpu.core import enable_compilation_cache
    from semanticlens_tpu.foundation_models import OpenClip
    from semanticlens_tpu.models import GPT2, Gemma2, Llama
    from semanticlens_tpu.relevance.text import token_relevance

    enable_compilation_cache()
    t0 = time.perf_counter()
    rng = np.random.default_rng(0)

    # synthetic topic corpus (stand-in tokenizer: bounded codepoints).
    # pad_id 159 ('\\x9f' mod v) never starts/ends a topic sentence; the
    # subject gets the same pad_id so pad runs are masked out of attention.
    v, pad_id = 160, 159
    texts = [f"{TOPICS[i % len(TOPICS)]} appears in sentence {i}" for i in range(args.samples)]
    ds = TokenTextDataset.from_texts(
        texts, lambda t: [ord(c) % v for c in t], args.seq_len,
        pad="left", pad_id=pad_id, name="lm-audit-corpus")
    tokens = ds.images

    if args.family == "llama":
        lm = Llama(vocab_size=v, n_positions=args.seq_len, width=args.width,
                   depth=args.depth, heads=args.heads,
                   kv_heads=max(1, args.heads // 2), dtype=jnp.float32,
                   pad_id=pad_id)
        default_layer = f"model.layers.{args.depth - 1}.mlp.act_fn"
    elif args.family == "gemma2":
        lm = Gemma2(vocab_size=v, n_positions=args.seq_len, width=args.width,
                    depth=args.depth, heads=args.heads,
                    kv_heads=max(1, args.heads // 2),
                    sliding_window=args.seq_len // 2, dtype=jnp.float32,
                    pad_id=pad_id)
        default_layer = f"model.layers.{args.depth - 1}.mlp.act_fn"
    else:
        lm = GPT2(vocab_size=v, n_positions=args.seq_len, width=args.width,
                  depth=args.depth, heads=args.heads, dtype=jnp.float32,
                  pad_id=pad_id)
        default_layer = f"transformer.h.{args.depth - 1}.mlp.act"
    lm.params = lm.init(jax.random.PRNGKey(0))
    lm.name = f"lm-audit-{args.family}"
    layer = args.layer or default_layer

    cv = TextActivationComponentVisualizer(
        model=lm, dataset_model=ds, dataset_fm=ds.texts_view(),
        layer_names=[layer], num_samples=args.evidence, cache_dir=None)
    fm = OpenClip("ViT-B-32", dtype=jnp.float32)
    lens = Lens(fm)

    db = lens.compute_concept_db(cv, batch_size=args.batch)
    n_comp = db[layer].shape[0]
    print(json.dumps({"stage": "collect+embed", "layer": layer,
                      "components": n_comp, "evidence": args.evidence,
                      "wall_s": round(time.perf_counter() - t0, 2)}))

    agg = {k: np.asarray(vv, np.float32).mean(1) for k, vv in db.items()}
    words, scores_ = lens.label_components(
        TOPICS, agg, scoring="wpmi",
        evidence_ids={layer: cv.get_max_reference(layer)},
        image_embeds=cv.embedding_table)[layer]
    clarity = np.asarray(lens.eval_clarity(db)[layer], np.float32)
    best = int(np.nanargmax(clarity))
    print(json.dumps({"stage": "analyze", "clarity_mean": round(float(np.nanmean(clarity)), 4),
                      "clearest_component": best,
                      "its_label": words[best][0],
                      "its_evidence": [t for t in cv.get_max_reference_texts(layer)[best] if t][:3]}))

    ev = cv.get_max_reference(layer)[best]
    ev = ev[ev >= 0]
    ctl = rng.choice(args.samples, size=ev.size, replace=False)
    ratio = causal.necessity_ratio(lm, lm.params, layer, [best],
                                   jnp.asarray(tokens[ev]), jnp.asarray(tokens[ctl]))
    rel = token_relevance(lm, lm.params, jnp.asarray(tokens[ev[:1]]), layer, best)
    peak = int(np.argmax(np.abs(np.asarray(rel)[0])))
    print(json.dumps({"stage": "validate",
                      "necessity_ratio": round(float(np.asarray(ratio)[0]), 3),
                      "top_relevant_token_index": peak,
                      "total_wall_s": round(time.perf_counter() - t0, 2),
                      "device": str(jax.devices()[0])}))


if __name__ == "__main__":
    main()
