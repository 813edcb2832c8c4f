"""Full model audit (BASELINE.md config 5): all-layer concept DB + scores + search.

Runs the complete pipeline sharded over every available chip:

1. Collect + Embed (fused single pass) over all requested layers;
2. clarity / redundancy / polysemanticity per layer;
3. text search over every layer for the given queries;
4. per-stage wall-clock + throughput report (JSON to stdout).

Usage:
    python tools/full_audit.py [--images /path.npy | --image-dir DIR]
        [--arch resnet|vit] [--depth 50] [--layers layer1 ... | blocks.N.mlp ...]
        [--n-samples 25] [--batch 256] [--queries dog "striped pattern"]
        [--vocabulary dog cat ...]  (CLIP-Dissect component naming)
        [--fm ViT-B-32|siglip2|mobileclip-s1] [--checkpoint ckpt.safetensors]
        [--bpe merges.gz] [--cache-dir cache] [--no-mesh]

Offline (no weights) it still runs end-to-end with random weights — the
systems path is identical; only the semantics of the embeddings change.
"""

from __future__ import annotations

import sys
from pathlib import Path

# Allow running as `python tools/<tool>.py` from a source checkout.
_repo = Path(__file__).resolve().parent.parent
if str(_repo) not in sys.path:
    sys.path.insert(0, str(_repo))


import argparse
import json

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", default=None, help=".npy uint8 (N,H,W,3)")
    ap.add_argument("--image-dir", default=None)
    ap.add_argument("--n-synthetic", type=int, default=1024)
    ap.add_argument("--image-size", type=int, default=224)
    ap.add_argument("--arch", default="resnet",
                    choices=["resnet", "vit", "convnext", "vgg", "densenet", "efficientnet",
                             "mobilenet", "inception", "swin", "regnet", "shufflenet",
                             "alexnet", "squeezenet", "mnasnet", "swin_v2", "maxvit"])
    ap.add_argument("--depth", type=int, default=50)
    ap.add_argument(
        "--variant",
        default="",
        help="resnet: '' (torchvision), 'd' (timm resnet*d), 'x' (resnext 32x4d/32x8d), "
        "or 'wide' (wide_resnet*_2); convnext/swin: tiny/small/base; efficientnet: b0..b7; "
        "mobilenet: v2/large/small; inception: v1/v3",
    )
    ap.add_argument("--layers", nargs="*", default=["layer1", "layer2", "layer3", "layer4"])
    ap.add_argument("--n-samples", type=int, default=25)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--queries", nargs="*", default=["dog", "car wheel", "striped pattern"])
    ap.add_argument(
        "--label-scoring",
        default="cosine",
        choices=["cosine", "wpmi"],
        help="component naming score: mean-vector cosine or CLIP-Dissect soft-WPMI "
        "over each component's top-activating images",
    )
    ap.add_argument(
        "--vocabulary",
        nargs="*",
        default=[],
        help="words for CLIP-Dissect-style component naming (label_components)",
    )
    ap.add_argument(
        "--image-query-indices",
        nargs="*",
        type=int,
        default=[],
        help="dataset indices used as image-probing queries (reference image_probing)",
    )
    ap.add_argument("--fm", default="ViT-B-32")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument(
        "--model-checkpoint",
        default=None,
        help="subject-model state dict (.pt): torchvision ResNet/VGG, timm ViT-B or ConvNeXt per --arch",
    )
    ap.add_argument("--bpe", default=None)
    ap.add_argument("--cache-dir", default=None)
    ap.add_argument("--no-mesh", action="store_true")
    args = ap.parse_args()
    if args.arch not in ("resnet", "vgg", "densenet") and args.depth != 50:
        ap.error("--depth configures --arch resnet/vgg/densenet only")
    if args.arch == "vit" and args.variant:
        ap.error(
            "--variant configures --arch resnet (timm *d), convnext (tiny/small/base), "
            "efficientnet (b0..b7), or mobilenet (v2/large/small)"
        )

    import jax
    import jax.numpy as jnp

    import semanticlens_tpu as sl
    from semanticlens_tpu.collect import ActivationComponentVisualizer
    from semanticlens_tpu.core import data_mesh, enable_compilation_cache

    enable_compilation_cache()
    from semanticlens_tpu.data import ArrayDataset, ImageFolder
    from semanticlens_tpu.models import ResNet
    from semanticlens_tpu.ops.aggregators import aggregate_conv_mean, aggregate_transformer_mean
    from semanticlens_tpu.utils import StageTimer, make_preprocess_fn, setup_colored_logging

    setup_colored_logging("INFO")
    timer = StageTimer()

    # --- data ----------------------------------------------------------------
    if args.image_dir:
        dataset = ImageFolder(args.image_dir, image_size=args.image_size)
    elif args.images:
        dataset = ArrayDataset(np.load(args.images), name=str(args.images))
    else:
        rng = np.random.default_rng(0)
        dataset = ArrayDataset(
            rng.integers(0, 255, size=(args.n_synthetic, args.image_size, args.image_size, 3), dtype=np.uint8),
            name="synthetic-audit",
        )
    n = len(dataset)

    # --- mesh ------------------------------------------------------------------
    mesh = None
    if not args.no_mesh and jax.device_count() > 1:
        mesh = data_mesh()

    # --- models ----------------------------------------------------------------
    if args.arch == "vit":
        # BASELINE.md config 3: transformer backbone, MLP/attention components.
        from semanticlens_tpu.models import VisionTransformer

        model = VisionTransformer(image_size=args.image_size, dtype=jnp.bfloat16)
        default_vit_layers = [f"blocks.{i}.mlp" for i in range(0, model.depth, 3)]
        if args.layers == ["layer1", "layer2", "layer3", "layer4"]:  # resnet default
            args.layers = default_vit_layers
        aggregate_fn = aggregate_transformer_mean
        model_name = f"vitb{args.image_size // model.grid}-audit"
    elif args.arch == "convnext":
        from semanticlens_tpu.models import ConvNeXt

        model = ConvNeXt(variant=args.variant or "tiny", dtype=jnp.bfloat16)
        if args.layers == ["layer1", "layer2", "layer3", "layer4"]:  # resnet default
            args.layers = [f"stages.{i}" for i in range(4)]
        aggregate_fn = aggregate_conv_mean
        model_name = f"convnext-{model.variant}-audit"
    elif args.arch == "vgg":
        from semanticlens_tpu.models import VGG

        depth = args.depth if args.depth != 50 else 16  # 50 = the resnet default
        if depth not in (11, 13, 16, 19):
            ap.error(f"--arch vgg supports --depth 11/13/16/19, got {depth}")
        model = VGG(depth=depth, dtype=jnp.bfloat16)
        if args.layers == ["layer1", "layer2", "layer3", "layer4"]:  # resnet default
            # last conv of each stage (vgg16 torchvision indices)
            stage_last = {11: [0, 3, 8, 13, 18], 13: [2, 7, 12, 17, 22],
                          16: [2, 7, 14, 21, 28], 19: [2, 7, 16, 25, 34]}[depth]
            args.layers = [f"features.{i}" for i in stage_last[1:]]
        aggregate_fn = aggregate_conv_mean
        model_name = f"vgg{depth}-audit"
    elif args.arch == "efficientnet":
        from semanticlens_tpu.models import EfficientNet, EfficientNetV2

        variant = args.variant or "b0"
        if variant.startswith("v2"):
            model = EfficientNetV2(variant=variant, dtype=jnp.bfloat16)
            n_stages = len(model.stages)
            default = [f"features.{i}" for i in (2, 3, n_stages - 1, n_stages)]
        else:
            model = EfficientNet(variant=variant, dtype=jnp.bfloat16)
            default = [f"features.{i}" for i in (2, 4, 6, 8)]
        if args.layers == ["layer1", "layer2", "layer3", "layer4"]:  # resnet default
            args.layers = default
        aggregate_fn = aggregate_conv_mean
        model_name = f"efficientnet-{model.variant}-audit"
    elif args.arch == "mobilenet":
        from semanticlens_tpu.models import MobileNetV2, MobileNetV3

        variant = args.variant or "v2"
        if variant == "v2":
            model = MobileNetV2(dtype=jnp.bfloat16)
            stage_taps = (4, 7, 14, 18)  # last block of each stride stage + tail
        elif variant in ("large", "small"):
            model = MobileNetV3(variant=variant, dtype=jnp.bfloat16)
            stage_taps = (4, 7, 13, 16) if variant == "large" else (2, 4, 9, 12)
        else:
            ap.error("--arch mobilenet supports --variant v2/large/small")
        if args.layers == ["layer1", "layer2", "layer3", "layer4"]:  # resnet default
            args.layers = [f"features.{i}" for i in stage_taps]
        aggregate_fn = aggregate_conv_mean
        model_name = f"mobilenet-{variant}-audit"
    elif args.arch in ("swin", "swin_v2"):
        from semanticlens_tpu.models import SwinTransformer, SwinTransformerV2

        cls = SwinTransformerV2 if args.arch == "swin_v2" else SwinTransformer
        model = cls(variant=args.variant or "tiny", dtype=jnp.bfloat16)
        if args.layers == ["layer1", "layer2", "layer3", "layer4"]:  # resnet default
            args.layers = ["features.1", "features.3", "features.5", "features.7"]
        aggregate_fn = aggregate_conv_mean  # swin taps are (B, H, W, C)
        model_name = f"{args.arch}-{model.variant}-audit"
    elif args.arch == "inception":
        from semanticlens_tpu.models import GoogLeNet, InceptionV3

        variant = args.variant or "v1"
        if variant == "v1":
            model = GoogLeNet(dtype=jnp.bfloat16)
            default_taps = ["inception3b", "inception4c", "inception4e", "inception5b"]
        elif variant == "v3":
            model = InceptionV3(dtype=jnp.bfloat16)
            default_taps = ["Mixed_5d", "Mixed_6b", "Mixed_6e", "Mixed_7c"]
        else:
            ap.error("--arch inception supports --variant v1/v3")
        if args.layers == ["layer1", "layer2", "layer3", "layer4"]:  # resnet default
            args.layers = default_taps
        aggregate_fn = aggregate_conv_mean
        model_name = f"{'googlenet' if variant == 'v1' else 'inception_v3'}-audit"
    elif args.arch == "regnet":
        from semanticlens_tpu.models import RegNet

        model = RegNet(variant=args.variant or "y_400mf", dtype=jnp.bfloat16)
        if args.layers == ["layer1", "layer2", "layer3", "layer4"]:  # resnet default
            args.layers = [f"trunk_output.block{i}" for i in range(1, 5)]
        aggregate_fn = aggregate_conv_mean
        model_name = f"regnet_{model.variant}-audit"
    elif args.arch == "shufflenet":
        from semanticlens_tpu.models import ShuffleNetV2

        model = ShuffleNetV2(variant=args.variant or "x1_0", dtype=jnp.bfloat16)
        if args.layers == ["layer1", "layer2", "layer3", "layer4"]:  # resnet default
            args.layers = ["stage2", "stage3", "stage4", "conv5"]
        aggregate_fn = aggregate_conv_mean
        model_name = f"shufflenet_v2_{model.variant}-audit"
    elif args.arch == "maxvit":
        from semanticlens_tpu.models import MaxViT

        model = MaxViT(variant=args.variant or "tiny", dtype=jnp.bfloat16)
        if args.layers == ["layer1", "layer2", "layer3", "layer4"]:  # resnet default
            args.layers = [f"blocks.{i}" for i in range(4)]
        aggregate_fn = aggregate_conv_mean
        model_name = f"maxvit_{model.variant}-audit"
    elif args.arch == "mnasnet":
        from semanticlens_tpu.models import MNASNet

        model = MNASNet(variant=args.variant or "1_0", dtype=jnp.bfloat16)
        if args.layers == ["layer1", "layer2", "layer3", "layer4"]:  # resnet default
            args.layers = ["layers.9", "layers.10", "layers.12", "layers.13"]
        aggregate_fn = aggregate_conv_mean
        model_name = f"mnasnet{model.variant}-audit"
    elif args.arch == "alexnet":
        from semanticlens_tpu.models import AlexNet

        model = AlexNet(dtype=jnp.bfloat16)
        if args.layers == ["layer1", "layer2", "layer3", "layer4"]:  # resnet default
            args.layers = ["features.4", "features.7", "features.9", "features.12"]
        aggregate_fn = aggregate_conv_mean
        model_name = "alexnet-audit"
    elif args.arch == "squeezenet":
        from semanticlens_tpu.models import SqueezeNet

        model = SqueezeNet(version=args.variant or "1_0", dtype=jnp.bfloat16)
        if args.layers == ["layer1", "layer2", "layer3", "layer4"]:  # resnet default
            # fire-module outputs present in BOTH versions' plans
            args.layers = ["features.4", "features.7", "features.10", "features.12"]
        aggregate_fn = aggregate_conv_mean
        model_name = f"squeezenet{model.version}-audit"
    elif args.arch == "densenet":
        from semanticlens_tpu.models import DenseNet

        depth = args.depth if args.depth != 50 else 121  # 50 = the resnet default
        if depth not in (121, 161, 169, 201):
            ap.error(f"--arch densenet supports --depth 121/161/169/201, got {depth}")
        model = DenseNet(depth=depth, dtype=jnp.bfloat16)
        if args.layers == ["layer1", "layer2", "layer3", "layer4"]:  # resnet default
            args.layers = [f"features.denseblock{i}" for i in range(1, 5)]
        aggregate_fn = aggregate_conv_mean
        model_name = f"densenet{depth}-audit"
    else:
        if args.variant in ("", "d"):
            model = ResNet(depth=args.depth, num_classes=1000, dtype=jnp.bfloat16, variant=args.variant)
            model_name = f"resnet{args.depth}{args.variant}-audit"
        elif args.variant == "x":  # torchvision resnext{50_32x4d,101_32x8d}
            width = 8 if args.depth == 101 else 4
            model = ResNet(depth=args.depth, num_classes=1000, dtype=jnp.bfloat16,
                           groups=32, width_per_group=width)
            model_name = f"resnext{args.depth}_32x{width}d-audit"
        elif args.variant == "wide":  # torchvision wide_resnet{50,101}_2
            model = ResNet(depth=args.depth, num_classes=1000, dtype=jnp.bfloat16, width_per_group=128)
            model_name = f"wide_resnet{args.depth}_2-audit"
        else:
            ap.error("--arch resnet supports --variant ''/d/x/wide")
        aggregate_fn = aggregate_conv_mean
    if args.model_checkpoint:
        import torch

        model.params = model.load_torch_state_dict(
            torch.load(args.model_checkpoint, map_location="cpu")
        )
    else:
        model.params = model.init(jax.random.PRNGKey(0))
    model.name = model_name

    from semanticlens_tpu.foundation_models import create as create_fm

    fm = create_fm(
        args.fm, checkpoint=args.checkpoint, bpe_path=args.bpe, dtype=jnp.bfloat16, mesh=mesh
    )
    lens = sl.Lens(fm)

    cv = ActivationComponentVisualizer(
        model=model,
        dataset_model=dataset,
        dataset_fm=dataset,
        layer_names=list(args.layers),
        num_samples=args.n_samples,
        aggregate_fn=aggregate_fn,
        model_preprocess=make_preprocess_fn(size=args.image_size, crop=args.image_size),
        cache_dir=args.cache_dir,
        mesh=mesh,
    )

    # --- pipeline ----------------------------------------------------------------
    with timer.stage("collect+embed", items=n):
        concept_db = lens.compute_concept_db(cv, batch_size=args.batch)
        for v in concept_db.values():
            np.asarray(v)

    agg_db = {k: np.asarray(v).mean(1) for k, v in concept_db.items()}

    scores_out = {}
    with timer.stage("scores"):
        scored_db = concept_db
        if mesh is not None:
            # Component-axis sharding runs the whole Analyze stage
            # data-parallel (scores are independent per component).
            from semanticlens_tpu.core import shard_concept_db

            scored_db = shard_concept_db(concept_db, mesh)
        clarity = lens.eval_clarity(scored_db)
        redundancy = lens.eval_redundancy(agg_db)
        poly = lens.eval_polysemanticity(scored_db)
        from semanticlens_tpu.scores import null_calibrated_polysemanticity

        for layer in args.layers:
            # null-calibrated index (arXiv:2508.16950): z-score vs random
            # evidence drawn from the full embedding table, comparable
            # across layers/models unlike the raw polysemanticity floor.
            # The table only exists when the embed stage ran THIS process
            # (a concept-DB cache hit skips it).
            npi_mean = None
            if cv.embedding_table is not None:
                npi, _, _, _ = null_calibrated_polysemanticity(
                    concept_db[layer], cv.embedding_table)
                npi_mean = float(np.nanmean(npi))
            scored = {
                "clarity_mean": float(np.asarray(clarity[layer]).mean()),
                "redundancy": float(np.asarray(redundancy[layer])),
                "polysemanticity_mean": float(np.asarray(poly[layer]).mean()),
            }
            if npi_mean is not None:
                scored["npi_mean"] = npi_mean
            scores_out[layer] = scored

    search_out = {}
    with timer.stage("text-search"):
        hits = lens.text_probing(list(args.queries), agg_db, templates=["a photo of a {}"])
        for layer, sim in hits.items():
            sim = np.asarray(sim)
            search_out[layer] = {
                q: int(sim[i].argmax()) for i, q in enumerate(args.queries)
            }

    # streaming exact top-5 per query over every layer's bank (memory-bounded
    # path for audit-scale component counts)
    top5 = {}
    with timer.stage("topk-search"):
        from semanticlens_tpu.scores import topk_cosine_search

        queries = np.asarray(fm.encode_text(fm.tokenize(list(args.queries))), np.float32)
        for layer, bank in agg_db.items():
            k = min(5, bank.shape[0])
            _vals, idx = topk_cosine_search(queries, bank, k=k)
            top5[layer] = {q: np.asarray(idx)[i].tolist() for i, q in enumerate(args.queries)}

    # class composition (crp Statistics analogue) when the dataset has labels
    class_stats_out = {}
    dataset_labels = getattr(dataset, "labels", None)
    if dataset_labels is None and hasattr(dataset, "samples"):
        dataset_labels = np.asarray([lab for _p, lab in dataset.samples])
    if dataset_labels is not None and np.asarray(dataset_labels).max() > 0:
        from semanticlens_tpu.scores import class_composition

        with timer.stage("class-composition"):
            for layer in args.layers:
                ids = cv.get_max_reference(layer)  # (C, k) top sample ids
                counts, purity = class_composition(ids, np.asarray(dataset_labels))
                # A component backed by one sample has purity 1.0 trivially;
                # require at least half the top-k slots filled before calling
                # it class-selective, then rank by (purity, evidence).
                evidence = counts.sum(axis=1)
                eligible = evidence >= max(2, args.n_samples // 2)
                ranked = np.lexsort((-evidence, -np.where(eligible, purity, -1.0)))[:8]
                class_stats_out[layer] = {
                    str(int(i)): {
                        "purity": round(float(purity[i]), 4),
                        "evidence": int(evidence[i]),
                        "top_class": int(counts[i].argmax()),
                    }
                    for i in ranked
                    if eligible[i]
                }

    image_probe_out = {}
    if args.image_query_indices:
        from semanticlens_tpu.data.dataset import get_image

        with timer.stage("image-probing"):
            queries = [get_image(dataset, i) for i in args.image_query_indices]
            hits = lens.image_probing(np.stack(queries), agg_db)
            for layer, sim in hits.items():
                image_probe_out[layer] = int(np.asarray(sim).argmax())

    labels_out = {}
    if args.vocabulary:
        # CLIP-Dissect-style naming: every component gets its best vocabulary
        # word (arXiv:2204.10965); reported for the first N components/layer.
        label_kwargs = {}
        if args.label_scoring == "wpmi":
            table = cv.embedding_table
            if table is None:
                raise SystemExit(
                    "--label-scoring wpmi needs the dataset embedding table; "
                    "rerun without a warm concept-db cache (the fused sweep "
                    "retains it) or use cosine scoring"
                )
            label_kwargs = {
                "scoring": "wpmi",
                "evidence_ids": {layer: cv.get_max_reference(layer) for layer in args.layers},
                "image_embeds": table,
            }
        with timer.stage("label-components"):
            named = lens.label_components(
                list(args.vocabulary), agg_db, top_m=1, templates=["a photo of a {}"],
                **label_kwargs,
            )
            for layer, (words, vals) in named.items():
                labels_out[layer] = {
                    str(i): {"word": words[i][0], "score": float(vals[i][0])}
                    for i in range(min(len(words), 16))
                }

    report = {
        "dataset": getattr(dataset, "name", "?"),
        "n_images": n,
        "layers": list(args.layers),
        "mesh": dict(mesh.shape) if mesh is not None else None,
        "db_shapes": {k: list(np.asarray(v).shape) for k, v in concept_db.items()},
        "scores": scores_out,
        "top_neuron_per_query": search_out,
        "top5_per_query": top5,
        "component_labels": labels_out,
        "image_probe_top_neuron": image_probe_out,
        "class_selective_components": class_stats_out,
        "stages": timer.summary(),
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
