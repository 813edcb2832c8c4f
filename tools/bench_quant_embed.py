"""Measure the int8-quantized towers against bf16 on chip.

Same scan-chain methodology as tools/bench_batch_cliff.py (device-generated
uint8 pool, best of N compile-free repeats): the CLIP ViT-B/32 encode chain
with float params vs int8-quantized params (ops/quant.py), the ResNet-50
Collect chain with float vs int8 stage convs, and the fused Collect+Embed
production body with the Embed tower quantized and with BOTH towers
quantized. Prints one JSON line per program, plus numeric-fidelity lines
(embedding cosine; top-k id overlap + value cosine for the Collect tower).

The v5e MXU's int8 path peaks at 2× bf16; the realizable tower speedup is
bounded by the non-matmul share (attention softmax, LayerNorms, BNs, dynamic
activation quantization) — this tool measures what is actually realized.
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

import jax
import jax.numpy as jnp

from semanticlens_tpu.core import enable_compilation_cache


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--total", type=int, default=2048)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--skip-fused", action="store_true")
    args = ap.parse_args()

    enable_compilation_cache()

    from semanticlens_tpu.collect.engine import CollectEngine
    from semanticlens_tpu.foundation_models.clip import OpenClip, quantize_clip_params
    from semanticlens_tpu.models.resnet import ResNet
    from semanticlens_tpu.ops.aggregators import aggregate_conv_mean
    from semanticlens_tpu.ops.preprocess import IMAGENET_MEAN, IMAGENET_STD

    fm = OpenClip("ViT-B-32", dtype=jnp.bfloat16, seed=0)
    qparams = quantize_clip_params(fm.params, fm.cfg)

    batch, total = args.batch, args.total
    chain = total // batch
    flat = jax.jit(
        lambda k: jax.random.randint(k, (chain * batch, 224, 224, 3), 0, 255, jnp.uint8)
    )(jax.random.PRNGKey(0))
    stacked = jnp.reshape(flat, (chain, batch, 224, 224, 3))
    np.asarray(stacked[:1, :1, :1, :1])

    @jax.jit
    def embed_chain(fp, st):
        def body(acc, xb):
            return acc + jnp.sum(fm._encode_image(fp, fm.preprocess(xb))), ()

        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), st)
        return acc

    def best_of(fn, *fargs, n=args.repeats):
        np.asarray(fn(*fargs))  # compile + warm
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            np.asarray(fn(*fargs))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    row = {"batch": batch, "total": chain * batch}
    row["embed_bf16_imgs_per_s"] = round((chain * batch) / best_of(embed_chain, fm.params, stacked), 1)
    row["embed_int8_imgs_per_s"] = round((chain * batch) / best_of(embed_chain, qparams, stacked), 1)
    row["embed_speedup"] = round(row["embed_int8_imgs_per_s"] / row["embed_bf16_imgs_per_s"], 3)
    print(json.dumps(row), flush=True)

    # numeric parity on the SAME device inputs (bf16 tower noise floor ~0.001)
    emb_f = np.asarray(fm._encode_image(fm.params, fm.preprocess(stacked[0])))
    emb_q = np.asarray(fm._encode_image(qparams, fm.preprocess(stacked[0])))
    cos = (emb_f * emb_q).sum(-1) / (
        np.linalg.norm(emb_f, axis=-1) * np.linalg.norm(emb_q, axis=-1)
    )
    print(json.dumps({"cosine_min": float(cos.min()), "cosine_mean": float(cos.mean())}), flush=True)

    if args.skip_fused:
        return

    model = ResNet(depth=50, num_classes=1000, dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0))
    mean, std = jnp.asarray(IMAGENET_MEAN), jnp.asarray(IMAGENET_STD)
    engine = CollectEngine(
        model=model,
        layer_names=("layer1", "layer2", "layer3", "layer4"),
        aggregation_fn=aggregate_conv_mean,
        n_collect=25,
        input_preprocess=lambda x: (x.astype(jnp.float32) / 255.0 - mean) / std,
    )
    n_latents = engine.infer_n_latents(params, (batch, 224, 224, 3), np.uint8)

    @jax.jit
    def fused_chain(states, p, fp, st):
        def body(carry, xb):
            s, i = carry
            ids = i * jnp.int32(batch) + jnp.arange(batch, dtype=jnp.int32)
            s = engine._local_step(s, p, xb, ids, jnp.ones((batch,), bool))
            emb = jnp.sum(fm._encode_image(fp, fm.preprocess(xb)))
            return (s, i + 1), emb

        (states, _), embs = jax.lax.scan(body, (states, jnp.int32(0)), st)
        return jnp.sum(embs) + jnp.sum(states["layer4"].values.astype(jnp.float32))

    row2 = {"batch": batch}
    row2["fused_bf16_imgs_per_s"] = round(
        (chain * batch)
        / best_of(lambda fp, s: fused_chain(engine._init_states(n_latents), params, fp, s), fm.params, stacked),
        1,
    )
    row2["fused_int8_imgs_per_s"] = round(
        (chain * batch)
        / best_of(lambda fp, s: fused_chain(engine._init_states(n_latents), params, fp, s), qparams, stacked),
        1,
    )
    row2["fused_speedup"] = round(row2["fused_int8_imgs_per_s"] / row2["fused_bf16_imgs_per_s"], 3)
    print(json.dumps(row2), flush=True)

    # ---- Collect tower: bf16 vs int8 stage convs ------------------------
    qmodel = ResNet(depth=50, num_classes=1000, dtype=jnp.bfloat16, quantize="int8")
    m_qparams = qmodel._maybe_quantize(params)  # same float init, convs → int8

    @jax.jit
    def collect_chain(states, p, st):
        def body(carry, xb):
            s, i = carry
            ids = i * jnp.int32(batch) + jnp.arange(batch, dtype=jnp.int32)
            s = engine._local_step(s, p, xb, ids, jnp.ones((batch,), bool))
            return (s, i + 1), ()

        (states, _), _ = jax.lax.scan(body, (states, jnp.int32(0)), st)
        return jnp.sum(states["layer4"].values.astype(jnp.float32))

    row3 = {"batch": batch}
    row3["collect_bf16_imgs_per_s"] = round(
        (chain * batch)
        / best_of(lambda p, s: collect_chain(engine._init_states(n_latents), p, s), params, stacked),
        1,
    )
    row3["collect_int8_imgs_per_s"] = round(
        (chain * batch)
        / best_of(lambda p, s: collect_chain(engine._init_states(n_latents), p, s), m_qparams, stacked),
        1,
    )
    row3["collect_speedup"] = round(
        row3["collect_int8_imgs_per_s"] / row3["collect_bf16_imgs_per_s"], 3
    )
    print(json.dumps(row3), flush=True)

    # ---- Fused with BOTH towers int8 ------------------------------------
    row4 = {"batch": batch}
    row4["fused_int8both_imgs_per_s"] = round(
        (chain * batch)
        / best_of(
            lambda p, fp, s: fused_chain(engine._init_states(n_latents), p, fp, s),
            m_qparams,
            qparams,
            stacked,
        ),
        1,
    )
    row4["fused_int8both_speedup_vs_bf16"] = round(
        row4["fused_int8both_imgs_per_s"] / row2["fused_bf16_imgs_per_s"], 3
    )
    print(json.dumps(row4), flush=True)

    # ---- Collect-tower fidelity: the quantity that matters is WHICH
    # samples each component picks. Sweep the pool once with each tower and
    # compare per-component top-k id sets + value cosine.
    @jax.jit
    def final_states(p):
        def body(carry, xb):
            s, i = carry
            ids = i * jnp.int32(batch) + jnp.arange(batch, dtype=jnp.int32)
            s = engine._local_step(s, p, xb, ids, jnp.ones((batch,), bool))
            return (s, i + 1), ()

        (s, _), _ = jax.lax.scan(body, (engine._init_states(n_latents), jnp.int32(0)), stacked)
        return s

    sf, sq = final_states(params), final_states(m_qparams)
    fid = {}
    for layer in engine.layer_names:
        ids_f, ids_q = np.asarray(sf[layer].ids), np.asarray(sq[layer].ids)
        overlap = np.mean(
            [len(set(a) & set(b)) / len(a) for a, b in zip(ids_f, ids_q)]
        )
        vf = np.asarray(sf[layer].values, np.float32).ravel()
        vq = np.asarray(sq[layer].values, np.float32).ravel()
        cos = float((vf * vq).sum() / (np.linalg.norm(vf) * np.linalg.norm(vq) + 1e-12))
        fid[layer] = {"topk_id_overlap": round(float(overlap), 4), "value_cosine": round(cos, 5)}
    print(json.dumps({"collect_fidelity": fid}), flush=True)


if __name__ == "__main__":
    main()
