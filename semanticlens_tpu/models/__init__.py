"""Subject models with named activation taps."""

from semanticlens_tpu.models.base import SubjectModel, TapCollector, validate_layers
from semanticlens_tpu.models.classic import AlexNet, SqueezeNet
from semanticlens_tpu.models.convnext import ConvNeXt
from semanticlens_tpu.models.densenet import DenseNet
from semanticlens_tpu.models.efficientnet import EfficientNet, EfficientNetV2
from semanticlens_tpu.models.gemma import Gemma, Gemma2
from semanticlens_tpu.models.gpt import GPT2
from semanticlens_tpu.models.inception import GoogLeNet, InceptionV3
from semanticlens_tpu.models.llama import Llama, Qwen2
from semanticlens_tpu.models.maxvit import MaxViT
from semanticlens_tpu.models.mnasnet import MNASNet
from semanticlens_tpu.models.mobilenet import MobileNetV2, MobileNetV3
from semanticlens_tpu.models.phi import Phi3
from semanticlens_tpu.models.regnet import RegNet
from semanticlens_tpu.models.resnet import ResNet
from semanticlens_tpu.models.shufflenet import ShuffleNetV2
from semanticlens_tpu.models.swin import SwinTransformer, SwinTransformerV2
from semanticlens_tpu.models.torch_adapter import TorchSubjectModel
from semanticlens_tpu.models.vgg import VGG
from semanticlens_tpu.models.vit import VisionTransformer

__all__ = [
    "SubjectModel", "TapCollector", "validate_layers",
    "ResNet", "VisionTransformer", "ConvNeXt", "VGG", "DenseNet", "EfficientNet",
    "EfficientNetV2",
    "MobileNetV2", "MobileNetV3", "GoogLeNet", "InceptionV3", "SwinTransformer",
    "SwinTransformerV2",
    "RegNet", "ShuffleNetV2", "AlexNet", "SqueezeNet", "MNASNet", "MaxViT",
    "GPT2", "Llama", "Qwen2", "Gemma", "Gemma2", "Phi3", "TorchSubjectModel",
]

from semanticlens_tpu.models.flax_adapter import FlaxSubjectModel  # noqa: E402

__all__ += ["FlaxSubjectModel"]
