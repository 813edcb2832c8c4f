"""Dissect the foundation model ITSELF: neuron → joint-embedding directions.

The reference analyzes subject models only; the FM is a black-box encoder.
But a CLIP tower's own MLP neurons write directly into the residual stream,
and the stream maps (near-)linearly to the output embedding — so every
hidden unit has a DIRECTION in the joint image–text space that can be
searched and labeled with the same Analyze machinery used for subject
components. This is the "first-order/direct effect" decomposition used by
the neuron-interpretation literature on CLIP (Gandelsman et al.,
arXiv:2406.04341 interprets second-order effects; the direct-path map here
is its first step and the standard logit-lens linearization).

Linearization (documented approximation): the final LayerNorm's
mean-subtraction is applied EXACTLY (it is linear); its 1/std is
input-dependent and is dropped — directions are therefore defined up to a
positive per-input scale, which cosine-based search/labeling is invariant
to. Pooling: only the pooled token's residual stream reaches the output
(CLS for CLIP ViT, EOT for the text tower), so a direction describes the
neuron's write onto that token's stream.

Typical use::

    dirs = mlp_neuron_directions(fm.params, fm.cfg, block=10)     # (4w, D)
    words, scores = label_components(fm, vocab, dirs, top_m=3)    # name them
    hits = cosine_probe(query_embeds, dirs)                       # search them
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _final_map(params, tower: str):
    """(ln scale, projection) of the tower's residual-stream → embedding map."""
    if tower == "visual":
        return params["visual.ln_post.weight"], params["visual.proj"]
    if tower == "text":
        return params["ln_final.weight"], params["text_projection"]
    raise ValueError(f"tower must be 'visual' or 'text', got {tower!r}")


def residual_directions_to_embedding(params, directions, *, tower: str = "visual"):
    """Map (N, width) residual-stream write directions → (N, embed_dim).

    Applies the final LayerNorm's exact mean-subtraction and scale fold,
    then the output projection (see module docstring for the linearization
    contract).
    """
    ln_w, proj = _final_map(params, tower)
    d = jnp.asarray(directions, jnp.float32)
    if d.ndim != 2 or d.shape[1] != ln_w.shape[0]:
        raise ValueError(
            f"directions must be (N, {ln_w.shape[0]}) for this tower, got {tuple(d.shape)}"
        )
    d = d - jnp.mean(d, axis=1, keepdims=True)  # LN mean-subtraction (exact)
    out = jnp.matmul(
        d * ln_w.astype(jnp.float32)[None, :],
        jnp.asarray(proj, jnp.float32),
        precision="highest",
    )
    return np.asarray(out, np.float32)


def mlp_neuron_directions(params, cfg, block: int, *, tower: str = "visual") -> np.ndarray:
    """(mlp_hidden, embed_dim) direct-effect directions of one block's MLP.

    Hidden unit j of ``block``'s MLP writes row j of ``c_proj.weight`` into
    the residual stream (scaled by its data-dependent activation — a
    positive GELU-gated scalar, irrelevant to cosine analyses); this maps
    that write through the tower's final LN scale + projection.

    ``cfg`` is the FM's :class:`~semanticlens_tpu.foundation_models.clip.CLIPConfig`
    (used for bounds checking only).
    """
    layers = cfg.vision.layers if tower == "visual" else cfg.text.layers
    if not isinstance(layers, int):
        raise ValueError("mlp_neuron_directions supports transformer towers only")
    if not 0 <= block < layers:
        raise ValueError(f"block {block} out of range for a {layers}-layer {tower} tower")
    prefix = ("visual.transformer" if tower == "visual" else "transformer")
    w_out = params[f"{prefix}.resblocks.{block}.mlp.c_proj.weight"]  # (4w, w), (in,out)
    return residual_directions_to_embedding(params, w_out, tower=tower)


def attention_head_directions(params, cfg, block: int, *, tower: str = "visual") -> np.ndarray:
    """(n_heads, head_dim, embed_dim) per-head value-path output directions.

    Head h of ``block`` writes ``out_proj`` applied to its value subspace:
    the slice of ``out_proj.weight`` rows belonging to head h, mapped
    through the final LN scale + projection — the per-head direct-effect
    basis the second-order analysis of arXiv:2406.04341 builds on.
    """
    layers = cfg.vision.layers if tower == "visual" else cfg.text.layers
    heads = cfg.vision.heads if tower == "visual" else cfg.text.heads
    if not isinstance(layers, int):
        raise ValueError("attention_head_directions supports transformer towers only")
    if not 0 <= block < layers:
        raise ValueError(f"block {block} out of range for a {layers}-layer {tower} tower")
    prefix = ("visual.transformer" if tower == "visual" else "transformer")
    w_out = params[f"{prefix}.resblocks.{block}.attn.out_proj.weight"]  # (w, w), (in,out)
    width = w_out.shape[0]
    head_dim = width // heads
    flat = residual_directions_to_embedding(params, w_out, tower=tower)  # (w, D)
    return flat.reshape(heads, head_dim, -1)


def resnet_attnpool_neuron_directions(params) -> np.ndarray:
    """(C, embed_dim) direct-effect directions of the RN tower's final
    conv channels through the attention pool.

    CLIP's ModifiedResNet pools with AttentionPool2d: the embedding is
    ``c_proj(Σ_s p_s · v_proj(x_s))`` over spatial tokens (clip.py
    ``_rn_encode_image``). Channel c of the final feature map writes row c
    of ``v_proj.weight`` into every token's value, so its direct effect on
    the embedding is ``v_proj.weight[c] @ c_proj.weight`` — scaled by the
    nonnegative attention mass Σ_s p_s·x_s[c], irrelevant to cosine
    analyses. The neuron-attention decomposition of arXiv:2509.19943
    refines this per head (:func:`resnet_attnpool_neuron_head_directions`);
    this is its head-sum. No final LN exists on this tower — directions
    land in the joint space exactly.
    """
    v = jnp.asarray(params["visual.attnpool.v_proj.weight"], jnp.float32)  # (C, C)
    c = jnp.asarray(params["visual.attnpool.c_proj.weight"], jnp.float32)  # (C, D)
    return np.asarray(jnp.matmul(v, c, precision="highest"), np.float32)


def resnet_attnpool_neuron_head_directions(params, *, head_dim: int = 64) -> np.ndarray:
    """(C, n_heads, embed_dim) per-(channel, head) joint-space directions.

    The neuron-attention decomposition (arXiv:2509.19943): channel c's
    value write is split across attention heads — head h carries the slice
    ``v_proj.weight[c, h·hd:(h+1)·hd]`` through ``c_proj``'s matching rows.
    Summing over heads recovers :func:`resnet_attnpool_neuron_directions`.
    ``head_dim`` follows CLIP's AttentionPool2d (num_heads = C // 64).
    """
    v = jnp.asarray(params["visual.attnpool.v_proj.weight"], jnp.float32)  # (C, C)
    cw = jnp.asarray(params["visual.attnpool.c_proj.weight"], jnp.float32)  # (C, D)
    c_width = v.shape[1]
    if c_width % head_dim:
        raise ValueError(f"pooled width {c_width} not divisible by head_dim {head_dim}")
    heads = c_width // head_dim
    vh = v.reshape(v.shape[0], heads, head_dim)
    ch = cw.reshape(heads, head_dim, cw.shape[1])
    out = jnp.einsum("chd,hde->che", vh, ch, precision="highest")
    return np.asarray(out, np.float32)
