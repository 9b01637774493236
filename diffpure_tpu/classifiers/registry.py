"""Classifier factory mirroring utils.get_image_classifier
(ref utils.py:143-253).

Returns (model, translate_fn, preprocess) triples keyed by the reference
classifier names; `load(name, ckpt_path)` produces a ready
`logits = fn(params, x01)` callable on [0,1] NHWC images.
"""
from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from diffpure_tpu.classifiers import convert as ccv
from diffpure_tpu.classifiers.attribute import AttributeD, attribute_logits
from diffpure_tpu.classifiers.common import IMAGENET_MEAN, IMAGENET_STD, normalize
from diffpure_tpu.classifiers.resnet import (
    CifarResNet50, TorchvisionResNet, resnet18, resnet50, resnet101,
    wide_resnet50_2,
)
from diffpure_tpu.classifiers.vit import ViT, deit_small_config
from diffpure_tpu.classifiers.wideresnet import DMWideResNet, WideResNet, \
    wrn_70_16_dropout

Array = jax.Array

# name -> (model factory, state-dict translator). Names follow the reference
# CLI surface (ref run_scripts/*, utils.py:143-253).
_REGISTRY: Dict[str, Tuple[Callable, Callable]] = {
    # CIFAR-10
    "cifar10-wideresnet-28-10": (
        lambda: WideResNet(depth=28, widen_factor=10, sub_block1=True,
                           normalize_input=False),
        ccv.translate_wideresnet),  # robustbench Standard ([0,1] pixels)
    "cifar10-wrn-28-10-at0": (
        lambda: DMWideResNet(depth=28, width=10), ccv.translate_dm_wideresnet),
    "cifar10-wrn-28-10-at1": (
        lambda: DMWideResNet(depth=28, width=10), ccv.translate_dm_wideresnet),
    "cifar10-wrn-70-16-at0": (
        lambda: DMWideResNet(depth=70, width=16), ccv.translate_dm_wideresnet),
    "cifar10-wrn-70-16-at1": (
        lambda: DMWideResNet(depth=70, width=16), ccv.translate_dm_wideresnet),
    "cifar10-wrn-70-16-L2-at1": (
        lambda: DMWideResNet(depth=70, width=16), ccv.translate_dm_wideresnet),
    "cifar10-wideresnet-70-16": (
        lambda: DMWideResNet(depth=70, width=16), ccv.translate_dm_wideresnet),
    "cifar10-resnet-50": (CifarResNet50, ccv.translate_cifar_resnet),
    "cifar10-wrn-70-16-dropout": (
        wrn_70_16_dropout, ccv.translate_wideresnet),
    # ImageNet (wrapped with the [0,1]->normalized shim below)
    "imagenet-resnet18": (resnet18, ccv.translate_torchvision_resnet),
    "imagenet-resnet50": (resnet50, ccv.translate_torchvision_resnet),
    "imagenet-resnet101": (resnet101, ccv.translate_torchvision_resnet),
    "imagenet-wideresnet-50-2": (
        wide_resnet50_2, ccv.translate_torchvision_resnet),
    "imagenet-deit-s": (
        lambda: ViT(**deit_small_config()), ccv.translate_vit),
}

CLASSIFIER_NAMES = tuple(_REGISTRY)


def get_classifier(name: str):
    """Return (model, translate_fn, logits_fn) for a classifier name.

    logits_fn(params, x01) takes [0,1] NHWC images, applying the reference's
    preprocessing wrappers: ImageNet models get the normalization shim
    (ref utils.py:144-155); CIFAR models consume [0,1] directly (internal
    normalization where the arch has it); celebahq__<attr> maps through
    the attribute wrapper (ref attribute_classifier.py:58-65).
    """
    if name.startswith("celebahq__"):
        model = AttributeD()

        def logits_fn(params, x01):
            return attribute_logits(model, params, x01)

        return model, ccv.translate_attribute_d, logits_fn

    if name not in _REGISTRY:
        raise KeyError(f"unknown classifier {name!r}; have {CLASSIFIER_NAMES}"
                       " plus celebahq__<attribute>")
    factory, translate = _REGISTRY[name]
    model = factory()

    if name.startswith("imagenet"):
        def logits_fn(params, x01):
            return model.apply(params, normalize(x01, IMAGENET_MEAN,
                                                 IMAGENET_STD))
    else:
        def logits_fn(params, x01):
            return model.apply(params, x01)

    return model, translate, logits_fn
