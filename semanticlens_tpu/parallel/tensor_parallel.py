"""Tensor-parallel sharding rules for the foundation-model towers.

The reference runs everything on one device (SURVEY.md §2: no parallelism to
port). Data parallelism covers the reference-scale models; these rules are
the forward-looking piece the survey calls for — "leave the FM encoder behind
a Mesh-aware pjit so larger FMs can later be tensor-sharded".

Design: Megatron-style column→row parallel pairs over a ``"model"`` mesh
axis, expressed purely as ``NamedSharding`` placements on the parameter
pytree. The tower code is unchanged — XLA GSPMD propagates the shardings
through the jitted encode and inserts the (all-reduce) collectives on ICI:

- attention ``in_proj`` (D, 3D): shard output dim → heads split across chips;
- attention ``out_proj`` (D, D): shard input dim → partial sums all-reduced;
- MLP ``c_fc`` (D, 4D): shard output dim; ``c_proj`` (4D, D): shard input dim;
- embeddings / norms / projections: replicated (small).

Activations stay sharded on the ``"data"`` axis, giving 2-D (dp × tp)
execution when the mesh has both axes.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _transformer_specs_2d(prefix: str, layers: int, model_axis: str):
    specs = {}
    for i in range(layers):
        p = f"{prefix}.resblocks.{i}"
        specs[f"{p}.attn.in_proj_weight"] = P(None, model_axis)
        specs[f"{p}.attn.in_proj_bias"] = P(model_axis)
        specs[f"{p}.attn.out_proj.weight"] = P(model_axis, None)
        specs[f"{p}.mlp.c_fc.weight"] = P(None, model_axis)
        specs[f"{p}.mlp.c_fc.bias"] = P(model_axis)
        specs[f"{p}.mlp.c_proj.weight"] = P(model_axis, None)
    return specs


def clip_param_specs_2d(cfg, *, model_axis: str = "model") -> dict[str, P]:
    """PartitionSpecs for a CLIP param dict (ViT or RN50 vision tower).

    Unlisted parameters are replicated. ``cfg`` is a
    :class:`~semanticlens_tpu.foundation_models.clip.CLIPConfig`.
    """
    specs = {}
    if cfg.vision.kind == "vit":
        specs.update(_transformer_specs_2d("visual.transformer", cfg.vision.layers, model_axis))
    specs.update(_transformer_specs_2d("transformer", cfg.text.layers, model_axis))
    return specs


def siglip_param_specs_2d(cfg, *, model_axis: str = "model") -> dict[str, P]:
    """PartitionSpecs for a SigLIP param dict (timm block naming)."""
    specs = {}
    for tower, layers in (("visual.blocks", cfg.vision_layers), ("text.blocks", cfg.text_layers)):
        for i in range(layers):
            p = f"{tower}.{i}"
            specs[f"{p}.attn.qkv.weight"] = P(None, model_axis)
            specs[f"{p}.attn.qkv.bias"] = P(model_axis)
            specs[f"{p}.attn.proj.weight"] = P(model_axis, None)
            specs[f"{p}.mlp.fc1.weight"] = P(None, model_axis)
            specs[f"{p}.mlp.fc1.bias"] = P(model_axis)
            specs[f"{p}.mlp.fc2.weight"] = P(model_axis, None)
    return specs


def shard_clip_params(params: dict, mesh: Mesh, specs: dict[str, P]):
    """Place a parameter dict onto ``mesh`` per ``specs`` (replicate the rest).

    Sharded dims must divide by the axis size; parameters whose spec does not
    divide evenly fall back to replication (with the head-count caveat that
    attention requires heads % tp == 0 for correctness — CLIP widths satisfy
    this for tp ∈ {2, 4, 8}).
    """
    axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))

    def place(name, arr):
        spec = specs.get(name)
        if spec is not None and _divides(arr.shape, spec, axis_sizes):
            return jax.device_put(arr, NamedSharding(mesh, spec))
        return jax.device_put(arr, NamedSharding(mesh, P()))

    return {name: place(name, arr) for name, arr in params.items()}


def _divides(shape, spec, axis_sizes) -> bool:
    for dim, axis in zip(shape, spec):
        if axis is None:
            continue
        if dim % axis_sizes[axis] != 0:
            return False
    return True
