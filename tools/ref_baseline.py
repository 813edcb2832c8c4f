"""Measure the REFERENCE pipeline's throughput on this host's torch device.

Drives the reference's actual Collect machinery (its ActMaxCache +
aggregators, imported from /root/reference) the way its
ActivationComponentVisualizer does — forward hooks on a torch ResNet-50,
``.detach().cpu()`` per layer per batch, host-side top-k — followed by the
reference's second full-dataset sweep for foundation-model embeddings
(activation_based.py:341-358 then 392-433), here a torch CLIP ViT-B/32
image tower.

The subject/FM towers are standard architectures written here in torch
(torchvision/open_clip are not installed in this image); the pipeline around
them is the reference's own code. The only torch device available is the CPU,
so this measures the reference on CPU — callers must label the ratio
accordingly.

Prints one JSON line:
    {"ref_imgs_per_s": N, "device": "cpu", "n_images": N, ...}
"""

from __future__ import annotations

import sys
from pathlib import Path

_repo = Path(__file__).resolve().parent.parent
if str(_repo) not in sys.path:
    sys.path.insert(0, str(_repo))

import argparse
import importlib.util
import json
import time
import types

import numpy as np

REFERENCE_ROOT = Path("/root/reference/semanticlens")


def load_reference_cv_modules():
    """Import the reference collect modules directly (its package __init__
    pulls in torchvision, which is not installed)."""
    pkg = types.ModuleType("refcv")
    pkg.__path__ = [str(REFERENCE_ROOT / "component_visualization")]
    sys.modules["refcv"] = pkg
    mods = {}
    for name in ["aggregators", "activation_caching"]:
        spec = importlib.util.spec_from_file_location(
            f"refcv.{name}", str(REFERENCE_ROOT / "component_visualization" / f"{name}.py")
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"refcv.{name}"] = mod
        spec.loader.exec_module(mod)
        mods[name] = mod
    return mods


# --------------------------------------------------------------------- towers
def build_torch_resnet50(torch):
    """Standard ResNet-50 (bottleneck v1) with torchvision-style layer names."""
    nn = torch.nn

    class Bottleneck(nn.Module):
        expansion = 4

        def __init__(self, cin, width, stride=1):
            super().__init__()
            cout = width * self.expansion
            self.conv1 = nn.Conv2d(cin, width, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(width)
            self.conv2 = nn.Conv2d(width, width, 3, stride=stride, padding=1, bias=False)
            self.bn2 = nn.BatchNorm2d(width)
            self.conv3 = nn.Conv2d(width, cout, 1, bias=False)
            self.bn3 = nn.BatchNorm2d(cout)
            self.relu = nn.ReLU(inplace=True)
            self.down = (
                nn.Sequential(nn.Conv2d(cin, cout, 1, stride=stride, bias=False), nn.BatchNorm2d(cout))
                if (stride != 1 or cin != cout)
                else None
            )

        def forward(self, x):
            idn = x if self.down is None else self.down(x)
            x = self.relu(self.bn1(self.conv1(x)))
            x = self.relu(self.bn2(self.conv2(x)))
            x = self.bn3(self.conv3(x))
            return self.relu(x + idn)

    class ResNet50(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.relu = nn.ReLU(inplace=True)
            self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)

            def stage(cin, width, blocks, stride):
                layers = [Bottleneck(cin, width, stride)]
                layers += [Bottleneck(width * 4, width) for _ in range(blocks - 1)]
                return nn.Sequential(*layers)

            self.layer1 = stage(64, 64, 3, 1)
            self.layer2 = stage(256, 128, 4, 2)
            self.layer3 = stage(512, 256, 6, 2)
            self.layer4 = stage(1024, 512, 3, 2)
            self.avgpool = nn.AdaptiveAvgPool2d(1)
            self.fc = nn.Linear(2048, 1000)

        def forward(self, x):
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
            return self.fc(torch.flatten(self.avgpool(x), 1))

    return ResNet50().eval()


def build_torch_clip_vit_b32(torch):
    """CLIP ViT-B/32 image tower (pre-LN transformer, QuickGELU), torch."""
    nn = torch.nn
    width, layers, heads, patch, image_size, embed_dim = 768, 12, 12, 32, 224, 512

    class QuickGELU(nn.Module):
        def forward(self, x):
            return x * torch.sigmoid(1.702 * x)

    class Block(nn.Module):
        def __init__(self):
            super().__init__()
            self.ln_1 = nn.LayerNorm(width)
            self.attn = nn.MultiheadAttention(width, heads, batch_first=True)
            self.ln_2 = nn.LayerNorm(width)
            self.mlp = nn.Sequential(nn.Linear(width, width * 4), QuickGELU(), nn.Linear(width * 4, width))

        def forward(self, x):
            y = self.ln_1(x)
            x = x + self.attn(y, y, y, need_weights=False)[0]
            return x + self.mlp(self.ln_2(x))

    class Visual(nn.Module):
        def __init__(self):
            super().__init__()
            grid = image_size // patch
            self.conv1 = nn.Conv2d(3, width, patch, stride=patch, bias=False)
            self.class_embedding = nn.Parameter(torch.randn(width) * 0.02)
            self.positional_embedding = nn.Parameter(torch.randn(grid * grid + 1, width) * 0.02)
            self.ln_pre = nn.LayerNorm(width)
            self.blocks = nn.Sequential(*[Block() for _ in range(layers)])
            self.ln_post = nn.LayerNorm(width)
            self.proj = nn.Parameter(torch.randn(width, embed_dim) * width**-0.5)

        def forward(self, x):
            x = self.conv1(x).flatten(2).transpose(1, 2)
            cls = self.class_embedding.expand(x.shape[0], 1, -1)
            x = torch.cat([cls, x], dim=1) + self.positional_embedding
            x = self.blocks(self.ln_pre(x))
            return self.ln_post(x[:, 0]) @ self.proj

    return Visual().eval()


# ------------------------------------------------------------------- pipeline
def measure(n_images: int, batch: int, image_size: int, n_collect: int, seed: int = 0) -> dict:
    import torch

    torch.set_num_threads(max(1, __import__("os").cpu_count()))
    mods = load_reference_cv_modules()
    agg = mods["aggregators"]
    ac = mods["activation_caching"]

    rng = np.random.default_rng(seed)
    images = rng.integers(0, 255, size=(n_images, 3, image_size, image_size), dtype=np.uint8)

    subject = build_torch_resnet50(torch)
    fm = build_torch_clip_vit_b32(torch)
    layer_names = ["layer1", "layer2", "layer3", "layer4"]
    cache = ac.ActMaxCache(layer_names, aggregation_fn=agg.aggregate_conv_mean, n_collect=n_collect)

    def norm_batch(lo, hi):
        x = torch.from_numpy(images[lo:hi]).float().div_(255.0)
        return (x - 0.45) / 0.225

    t0 = time.perf_counter()
    with torch.no_grad():
        # sweep 1: Collect, via the reference's own hook machinery
        # (activation_caching.py hook_context/_get_hook).
        with cache.hook_context(subject):
            for lo in range(0, n_images, batch):
                subject(norm_batch(lo, min(lo + batch, n_images)))
        embeds = []
        for lo in range(0, n_images, batch):  # sweep 2: Embed
            embeds.append(fm(norm_batch(lo, min(lo + batch, n_images))))
        emb = torch.cat(embeds).float().numpy()
    wall = time.perf_counter() - t0

    assert emb.shape == (n_images, 512)
    for name in layer_names:
        assert cache.cache[name].sample_ids.shape[1] == n_collect

    return {
        "ref_imgs_per_s": round(n_images / wall, 3),
        "device": "cpu",
        "torch_threads": torch.get_num_threads(),
        "n_images": n_images,
        "batch": batch,
        "image_size": image_size,
        "n_collect": n_collect,
        "wall_s": round(wall, 2),
        "pipeline": "reference ActMaxCache hooks on torch ResNet-50 + torch CLIP ViT-B/32 sweep",
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-images", type=int, default=64)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--image-size", type=int, default=224)
    ap.add_argument("--n-collect", type=int, default=25)
    args = ap.parse_args()
    print(json.dumps(measure(args.n_images, args.batch, args.image_size, args.n_collect)))


if __name__ == "__main__":
    main()
