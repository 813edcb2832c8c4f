"""Deploy-side torchvision parity harness for the subject-model zoo.

The in-suite family tests pin each architecture against a hand-written
torch twin because torchvision is not installed in the build image — and a
twin can share a bug with the implementation it checks (exactly what
happened with MaxViT's attention scale, caught only by review). This tool
is the independent check: on any machine WITH torchvision, it builds each
real torchvision model (random weights — no downloads), imports its state
dict through ``load_torch_state_dict``, and compares full-model forwards.

Usage:
  python tools/check_torchvision_parity.py                 # all families
  python tools/check_torchvision_parity.py --families resnet50 maxvit_t
  python tools/check_torchvision_parity.py --list

Prints one JSON line per family ({"family", "max_abs_diff", "ok"}) and a
summary line; exit code 1 if any family fails or torchvision is missing.
"""

from __future__ import annotations

import sys
from pathlib import Path

_repo = Path(__file__).resolve().parent.parent
if str(_repo) not in sys.path:
    sys.path.insert(0, str(_repo))

import argparse
import json


def _cases(models, jnp):
    """family → (torchvision builder name, ours builder, input size, atol)."""
    f32 = jnp.float32
    return {
        "resnet18": ("resnet18", lambda: models.ResNet(18, dtype=f32), 224, 1e-4),
        "resnet50": ("resnet50", lambda: models.ResNet(50, dtype=f32), 224, 1e-4),
        "resnext50_32x4d": ("resnext50_32x4d",
                            lambda: models.ResNet(50, groups=32, width_per_group=4, dtype=f32),
                            224, 1e-4),
        "wide_resnet50_2": ("wide_resnet50_2",
                            lambda: models.ResNet(50, width_per_group=128, dtype=f32),
                            224, 1e-4),
        "vgg16": ("vgg16", lambda: models.VGG(16, dtype=f32), 224, 1e-4),
        "vgg16_bn": ("vgg16_bn", lambda: models.VGG(16, batch_norm=True, dtype=f32), 224, 1e-4),
        "densenet121": ("densenet121", lambda: models.DenseNet(121, dtype=f32), 224, 1e-4),
        "efficientnet_b0": ("efficientnet_b0", lambda: models.EfficientNet("b0", dtype=f32),
                            224, 1e-4),
        "efficientnet_v2_s": ("efficientnet_v2_s",
                              lambda: models.EfficientNetV2("v2_s", dtype=f32), 224, 1e-4),
        "mobilenet_v2": ("mobilenet_v2", lambda: models.MobileNetV2(dtype=f32), 224, 1e-4),
        "mobilenet_v3_large": ("mobilenet_v3_large",
                               lambda: models.MobileNetV3("large", dtype=f32), 224, 1e-4),
        "googlenet": ("googlenet", lambda: models.GoogLeNet(dtype=f32), 224, 1e-4),
        "inception_v3": ("inception_v3", lambda: models.InceptionV3(dtype=f32), 299, 1e-4),
        "swin_t": ("swin_t", lambda: models.SwinTransformer("tiny", dtype=f32), 224, 5e-4),
        "swin_v2_t": ("swin_v2_t", lambda: models.SwinTransformerV2("tiny", dtype=f32),
                      224, 5e-4),
        "regnet_y_400mf": ("regnet_y_400mf", lambda: models.RegNet("y_400mf", dtype=f32),
                           224, 1e-4),
        "regnet_x_800mf": ("regnet_x_800mf", lambda: models.RegNet("x_800mf", dtype=f32),
                           224, 1e-4),
        "shufflenet_v2_x1_0": ("shufflenet_v2_x1_0",
                               lambda: models.ShuffleNetV2("x1_0", dtype=f32), 224, 1e-4),
        "mnasnet1_0": ("mnasnet1_0", lambda: models.MNASNet("1_0", dtype=f32), 224, 1e-4),
        "maxvit_t": ("maxvit_t", lambda: models.MaxViT("tiny", dtype=f32), 224, 5e-4),
        "alexnet": ("alexnet", lambda: models.AlexNet(dtype=f32), 224, 1e-4),
        "squeezenet1_0": ("squeezenet1_0", lambda: models.SqueezeNet("1_0", dtype=f32),
                          224, 1e-4),
        "squeezenet1_1": ("squeezenet1_1", lambda: models.SqueezeNet("1_1", dtype=f32),
                          224, 1e-4),
        "convnext_tiny": ("convnext_tiny",
                          lambda: models.ConvNeXt.from_name("convnext_tiny", dtype=f32),
                          224, 5e-4),
        "vit_b_16": ("vit_b_16",
                     lambda: models.VisionTransformer.from_name("vit_b_16", dtype=f32),
                     224, 5e-4),
    }


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n", 1)[0])
    ap.add_argument("--families", nargs="*", default=None)
    ap.add_argument("--list", action="store_true")
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")  # parity math, not throughput
    import jax.numpy as jnp
    import numpy as np

    from semanticlens_tpu import models

    cases = _cases(models, jnp)
    if args.list:
        print("\n".join(sorted(cases)))
        return 0

    try:
        import torch
        import torchvision.models as tvm
    except ImportError as e:
        print(json.dumps({"error": f"torchvision required on this machine: {e}"}))
        return 1

    chosen = args.families or sorted(cases)
    unknown = [f for f in chosen if f not in cases]
    if unknown:
        print(json.dumps({"error": f"unknown families {unknown}; --list shows all"}))
        return 1

    rng = np.random.default_rng(args.seed)
    failures = 0
    for fam in chosen:
        tv_name, build_ours, size, atol = cases[fam]
        torch.manual_seed(args.seed)
        # the inception families ship train-only aux heads our zoo omits
        kwargs = (
            {"aux_logits": False, "init_weights": True}
            if fam in ("googlenet", "inception_v3") else {}
        )
        # a broken converter raises (KeyError/shape ValueError) — that is a
        # FINDING, not a reason to abort the remaining families
        try:
            tv = getattr(tvm, tv_name)(**kwargs).eval()
            ours = build_ours()
            params = ours.load_torch_state_dict(tv.state_dict())
            x = rng.normal(size=(args.batch, size, size, 3)).astype(np.float32)
            with torch.no_grad():
                want = tv(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
            got, _ = ours.apply(params, jnp.asarray(x))
            diff = float(np.abs(np.asarray(got, np.float32) - want).max())
            ok = diff <= atol
            print(json.dumps({"family": fam, "max_abs_diff": diff, "atol": atol, "ok": ok}))
        except Exception as e:  # noqa: BLE001 — audit tool: record and continue
            ok = False
            print(json.dumps({"family": fam, "ok": False,
                              "error": f"{type(e).__name__}: {e}"}))
        failures += not ok

    print(json.dumps({"families": len(chosen), "failed": failures}))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
