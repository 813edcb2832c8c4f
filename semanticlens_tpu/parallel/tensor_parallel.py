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


def llama_param_specs_2d(model, *, model_axis: str = "model") -> dict[str, P]:
    """Megatron-style PartitionSpecs for a :class:`~semanticlens_tpu.models.llama.Llama`
    SUBJECT model (covers the Mistral/Qwen2 and Gemma/Gemma 2 variants —
    same param names; Gemma's extra sandwich norms are 1-D scales that stay
    replicated like every other norm).

    Weights are (in, out) (models/layers.py:linear): column-parallel =
    shard the OUTPUT dim of q/k/v and gate/up (each chip computes its head
    slice / its slice of the SwiGLU hidden), row-parallel = shard the INPUT
    dim of o_proj/down_proj (partial sums all-reduced on ICI). Norm scales
    and embeddings stay replicated. This is what makes 70B-class subjects
    dissectable: the dominant per-layer weights split ``tp``-ways while the
    collect engine keeps data parallelism on the other mesh axis.

    GSPMD is semantics-preserving — these specs are layout HINTS, never a
    correctness condition; for efficiency prefer ``heads % tp == 0`` and
    ``kv_heads % tp == 0`` (GQA: a kv dim that divides unevenly falls back
    to replication in :func:`shard_params`).
    """
    specs: dict[str, P] = {}
    for i in range(model.depth):
        p = f"model.layers.{i}"
        for col in ("self_attn.q_proj", "self_attn.k_proj", "self_attn.v_proj",
                    "mlp.gate_proj", "mlp.up_proj"):
            specs[f"{p}.{col}.weight"] = P(None, model_axis)
            specs[f"{p}.{col}.bias"] = P(model_axis)  # Qwen2 attention_bias only
        specs[f"{p}.self_attn.o_proj.weight"] = P(model_axis, None)
        specs[f"{p}.mlp.down_proj.weight"] = P(model_axis, None)
    return specs


def phi3_param_specs_2d(model, *, model_axis: str = "model") -> dict[str, P]:
    """PartitionSpecs for a :class:`~semanticlens_tpu.models.phi.Phi3` subject.

    The fused ``qkv_proj`` (D, (H+2KV)·hd) and ``gate_up_proj`` (D, 2I)
    shard their output dims; like GPT-2's ``c_attn``, the forward's split
    boundaries align with shard tiles only for friendly tp values, and XLA
    inserts one resharding collective otherwise. ``o_proj``/``down_proj``
    are row-parallel.
    """
    specs: dict[str, P] = {}
    for i in range(model.depth):
        p = f"model.layers.{i}"
        specs[f"{p}.self_attn.qkv_proj.weight"] = P(None, model_axis)
        specs[f"{p}.mlp.gate_up_proj.weight"] = P(None, model_axis)
        specs[f"{p}.self_attn.o_proj.weight"] = P(model_axis, None)
        specs[f"{p}.mlp.down_proj.weight"] = P(model_axis, None)
    return specs


def gpt2_param_specs_2d(model, *, model_axis: str = "model") -> dict[str, P]:
    """PartitionSpecs for a :class:`~semanticlens_tpu.models.gpt.GPT2` subject.

    The fused ``c_attn`` (D, 3D) shards its output dim; the forward's
    q/k/v slice boundaries sit at D and 2D, which align with shard tiles
    only when ``tp % 3 == 0``, so for the usual tp ∈ {2, 4, 8} XLA inserts
    one resharding collective after the QKV matmul. The MLP pair (2/3 of
    the per-layer FLOPs at 4× expansion) shards cleanly either way.
    """
    specs: dict[str, P] = {}
    for i in range(model.depth):
        p = f"transformer.h.{i}"
        specs[f"{p}.attn.c_attn.weight"] = P(None, model_axis)
        specs[f"{p}.attn.c_attn.bias"] = P(model_axis)
        specs[f"{p}.attn.c_proj.weight"] = P(model_axis, None)
        specs[f"{p}.mlp.c_fc.weight"] = P(None, model_axis)
        specs[f"{p}.mlp.c_fc.bias"] = P(model_axis)
        specs[f"{p}.mlp.c_proj.weight"] = P(model_axis, None)
    return specs


def shard_params(params: dict, mesh: Mesh, specs: dict[str, P]):
    """Place a parameter dict onto ``mesh`` per ``specs`` (replicate the rest).

    Sharded dims must divide by the axis size; parameters whose spec does not
    divide evenly fall back to replication (with the head-count caveat that
    attention requires heads % tp == 0 for efficiency — CLIP widths satisfy
    this for tp ∈ {2, 4, 8}). Works for any flat name→array dict: FM towers
    and subject models alike.
    """
    axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))

    def place(name, arr):
        spec = specs.get(name)
        if spec is not None and _divides(arr.shape, spec, axis_sizes):
            return jax.device_put(arr, NamedSharding(mesh, spec))
        return jax.device_put(arr, NamedSharding(mesh, P()))

    return {name: place(name, arr) for name, arr in params.items()}


#: Backward-compatible name from before the helper went generic.
shard_clip_params = shard_params


def _divides(shape, spec, axis_sizes) -> bool:
    for dim, axis in zip(shape, spec):
        if axis is None:
            continue
        if dim % axis_sizes[axis] != 0:
            return False
    return True
