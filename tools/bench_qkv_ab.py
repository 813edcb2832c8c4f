"""A/B the bf16 CLIP embed chain: fused-qkv vs split-qkv self-attention.

Round-5 regression probe: after commit 1d0ba30 switched the default
self-attention in-projection to one (D, 3D) matmul + output slices, the
bench embed ceiling moved 9,125 -> 8,322 imgs/s at batch 256 while the
collect ceiling stayed put — this tool isolates the attention variant on
the SAME session/chip/batch so the comparison is confound-free (the commit
message's 9,571 baseline was batch 128 and already fused).

Method: device-resident uint8 pool, scan-chained encode (no per-step
readback), best-of-N compile-free repeats; the split variant is injected by
rebinding ``multi_head_attention`` in the clip module's namespace (clip.py
binds the name at import, so that is the global the tower's trace reaches).
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
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--total", type=int, default=2048)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    enable_compilation_cache()

    from semanticlens_tpu.foundation_models import clip as clip_mod
    from semanticlens_tpu.foundation_models.clip import OpenClip
    from semanticlens_tpu.models.layers import (
        linear,
        scaled_dot_product_attention,
    )

    def split_qkv_mha(x, params, prefix, n_heads, *, mask=None, kv=None):
        w_in = params[f"{prefix}.in_proj_weight"]
        b_in = params[f"{prefix}.in_proj_bias"]
        d_model = x.shape[-1]
        kv = x if kv is None else kv
        q = linear(x, w_in[:, :d_model], b_in[:d_model])
        k = linear(kv, w_in[:, d_model : 2 * d_model], b_in[d_model : 2 * d_model])
        v = linear(kv, w_in[:, 2 * d_model :], b_in[2 * d_model :])
        out = scaled_dot_product_attention(q, k, v, n_heads, mask=mask)
        return linear(out, params[f"{prefix}.out_proj.weight"], params[f"{prefix}.out_proj.bias"])

    fm = OpenClip("ViT-B-32", dtype=jnp.bfloat16, seed=0)
    batch, total = args.batch, args.total
    chain = total // batch
    flat = jax.jit(
        lambda k: jax.random.randint(k, (chain * batch, 224, 224, 3), 0, 255, jnp.uint8)
    )(jax.random.PRNGKey(0))
    stacked = flat.reshape(chain, batch, 224, 224, 3)
    np.asarray(jax.jit(lambda a: a.sum())(stacked))  # materialize pool

    @jax.jit
    def embed_chain(fp, st):
        def body(acc, xb):
            z = fm._encode_image(fp, fm.preprocess(xb))
            return acc + z.sum(), None

        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), st)
        return acc

    def best_of(n=args.repeats):
        walls = []
        for _ in range(n):
            t0 = time.perf_counter()
            np.asarray(embed_chain(fm.params, stacked))
            walls.append(time.perf_counter() - t0)
        return min(walls)

    results = {}
    fused_mha = clip_mod.multi_head_attention
    for name, mha in (("fused_qkv", fused_mha), ("split_qkv", split_qkv_mha)):
        clip_mod.multi_head_attention = mha
        embed_chain.clear_cache()
        t0 = time.perf_counter()
        np.asarray(embed_chain(fm.params, stacked))  # compile + warm
        compile_s = time.perf_counter() - t0
        wall = best_of()
        results[name] = {
            "imgs_per_s": round(total / wall, 1),
            "wall_s": round(wall, 3),
            "compile_s": round(compile_s, 1),
        }
        print(json.dumps({name: results[name], "batch": batch}), flush=True)
    clip_mod.multi_head_attention = fused_mha

    ratio = results["split_qkv"]["imgs_per_s"] / results["fused_qkv"]["imgs_per_s"]
    print(json.dumps({"split_over_fused": round(ratio, 4)}), flush=True)


if __name__ == "__main__":
    main()
