from diffpure_tpu.classifiers.registry import get_classifier, CLASSIFIER_NAMES
from diffpure_tpu.classifiers.wideresnet import WideResNet, DMWideResNet
from diffpure_tpu.classifiers.resnet import CifarResNet50, TorchvisionResNet
from diffpure_tpu.classifiers.vit import ViT, deit_small_config
from diffpure_tpu.classifiers.attribute import AttributeD, attribute_logits

__all__ = [
    "get_classifier", "CLASSIFIER_NAMES",
    "WideResNet", "DMWideResNet", "CifarResNet50", "TorchvisionResNet",
    "ViT", "deit_small_config", "AttributeD", "attribute_logits",
]
