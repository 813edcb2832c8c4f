"""Cross-family tap contract: every advertised module name must be tapped.

The engine trusts ``module_names`` (validate_layers accepts any of them) and
then indexes ``taps[name]`` inside the jitted collect step
(collect/engine.py) — so a name that ``apply`` never records is a latent
KeyError, and a tap whose leading axis is not the image batch breaks the
validity-mask broadcast. This test walks EVERY family with tap_names =
module_names and pins both properties. (Reference contract: torch forward
hooks fire for every ``named_modules`` entry, activation_caching.py:266-277.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semanticlens_tpu.models import (
    VGG,
    AlexNet,
    ConvNeXt,
    DenseNet,
    EfficientNet,
    EfficientNetV2,
    GoogLeNet,
    InceptionV3,
    MaxViT,
    MNASNet,
    MobileNetV2,
    MobileNetV3,
    RegNet,
    ResNet,
    ShuffleNetV2,
    SqueezeNet,
    SwinTransformer,
    SwinTransformerV2,
    VisionTransformer,
)

B = 2

_CASES = [
    ("resnet18", lambda: ResNet(18, num_classes=7, dtype=jnp.float32), 64),
    ("resnext", lambda: ResNet(50, num_classes=7, dtype=jnp.float32,
                               groups=32, width_per_group=4), 64),
    ("vit", lambda: VisionTransformer(image_size=32, patch_size=8, width=64,
                                      depth=2, heads=2, num_classes=7,
                                      dtype=jnp.float32), 32),
    ("vit_headless", lambda: VisionTransformer(image_size=32, patch_size=8, width=64,
                                               depth=2, heads=2, num_classes=0,
                                               dtype=jnp.float32), 32),
    ("vit_torchvision", lambda: VisionTransformer(image_size=32, patch_size=8, width=64,
                                                  depth=2, heads=2, num_classes=7,
                                                  dtype=jnp.float32,
                                                  naming="torchvision"), 32),
    ("convnext", lambda: ConvNeXt("tiny", num_classes=7, dtype=jnp.float32), 64),
    # VGG's AdaptiveAvgPool2d((7,7)) needs the feature map to reach 7×7.
    ("vgg11bn", lambda: VGG(11, num_classes=7, batch_norm=True, dtype=jnp.float32), 224),
    ("densenet121", lambda: DenseNet(121, num_classes=7, dtype=jnp.float32), 64),
    ("efficientnet_b0", lambda: EfficientNet("b0", num_classes=7, dtype=jnp.float32), 64),
    ("efficientnet_v2_s", lambda: EfficientNetV2("v2_s", num_classes=7, dtype=jnp.float32), 64),
    ("mnasnet_0_5", lambda: MNASNet("0_5", num_classes=7, dtype=jnp.float32), 64),
    ("mobilenet_v2", lambda: MobileNetV2(num_classes=7, dtype=jnp.float32), 64),
    ("mobilenet_v3_small", lambda: MobileNetV3("small", num_classes=7,
                                               dtype=jnp.float32), 64),
    ("regnet_y_400mf", lambda: RegNet("y_400mf", num_classes=7, dtype=jnp.float32), 64),
    ("regnet_x_800mf", lambda: RegNet("x_800mf", num_classes=7, dtype=jnp.float32), 64),
    ("shufflenet_x1_0", lambda: ShuffleNetV2("x1_0", num_classes=7, dtype=jnp.float32), 64),
    ("googlenet", lambda: GoogLeNet(num_classes=7, dtype=jnp.float32), 96),
    ("inception_v3", lambda: InceptionV3(num_classes=7, dtype=jnp.float32), 96),
    ("swin_t", lambda: SwinTransformer("tiny", num_classes=7, dtype=jnp.float32), 56),
    ("swin_v2_t", lambda: SwinTransformerV2("tiny", num_classes=7, dtype=jnp.float32), 64),
    ("maxvit_t", lambda: MaxViT("tiny", num_classes=7, partition_size=2, dtype=jnp.float32), 64),
    # AlexNet's AdaptiveAvgPool2d((6,6)) needs the feature map to reach 6×6.
    ("alexnet", lambda: AlexNet(num_classes=7, dtype=jnp.float32), 224),
    ("squeezenet1_1", lambda: SqueezeNet("1_1", num_classes=7, dtype=jnp.float32), 96),
]


@pytest.mark.parametrize("name,make,size", _CASES, ids=[c[0] for c in _CASES])
def test_every_advertised_name_is_tapped_with_batch_leading(name, make, size):
    model = make()
    params = model.init(jax.random.PRNGKey(0))
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(B, size, size, 3)).astype(np.float32)
    )
    names = tuple(model.module_names)
    _, taps = model.apply(params, x, tap_names=names)
    missing = [n for n in names if n not in taps]
    assert not missing, f"{name}: advertised but never tapped: {missing}"
    bad = {n: tuple(v.shape) for n, v in taps.items() if v.shape[0] != B}
    assert not bad, f"{name}: taps whose leading axis is not the batch: {bad}"
