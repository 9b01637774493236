"""Torch -> flax translation for the classifier zoo.

Generic rewrite: module paths merge name+digit runs ('layer1.0' ->
'layer1_0'); leaves transform by kind (conv OIHW->HWIO, linear transpose,
norm weight->scale, BN running stats -> mean/var params). Per-architecture
quirks are handled by small pre-rules.
"""
from __future__ import annotations

import re
from typing import Dict, Mapping, Tuple

import numpy as np

from diffpure_tpu.models.convert import _nest, to_numpy_state_dict, \
    strip_module_prefix

SKIP_SUFFIXES = ("num_batches_tracked",)
SKIP_KEYS = ("mean", "std", "mu", "sigma", "lod_in")  # constant buffers


def _merge_modules(mods):
    out = []
    i = 0
    while i < len(mods):
        name = mods[i]
        i += 1
        while i < len(mods) and mods[i].isdigit():
            name += "_" + mods[i]
            i += 1
        out.append(name)
    return out


def _classifier_leaf(name: str, v: np.ndarray) -> Tuple[str, np.ndarray]:
    if name == "weight":
        if v.ndim == 4:
            return "kernel", v.transpose(2, 3, 1, 0)
        if v.ndim == 2:
            return "kernel", v.transpose(1, 0)
        if v.ndim == 1:
            return "scale", v
    if name == "bias":
        return "bias", v
    if name == "running_mean":
        return "mean", v
    if name == "running_var":
        return "var", v
    if name == "b":
        return "b", v
    raise ValueError(f"unhandled classifier leaf {name} shape {v.shape}")


def translate_classifier(sd: Mapping, pre_rules=()) -> Dict:
    """Generic translation. pre_rules: list of (regex, replacement) applied
    to the torch key string first."""
    sd = to_numpy_state_dict(strip_module_prefix(sd))
    flat = {}
    for k, v in sd.items():
        if any(k.endswith(s) for s in SKIP_SUFFIXES):
            continue
        if k in SKIP_KEYS:
            continue
        for pat, rep in pre_rules:
            k = re.sub(pat, rep, k)
        parts = k.split(".")
        leaf = parts[-1]
        path = "/".join(_merge_modules(parts[:-1]))
        new_leaf, arr = _classifier_leaf(leaf, v)
        flat[(path + "/" if path else "") + new_leaf] = arr
    return {"params": _nest(flat)}


def translate_wideresnet(sd: Mapping) -> Dict:
    """TRADES WRN / robustbench WideResNet (ref cifar10_resnet.py:137-193)."""
    return translate_classifier(sd)


def translate_dm_wideresnet(sd: Mapping) -> Dict:
    """robustbench DMWideResNet (Gowal/Rebuffi AT checkpoints)."""
    return translate_classifier(sd)


def translate_cifar_resnet(sd: Mapping) -> Dict:
    return translate_classifier(sd)


def translate_torchvision_resnet(sd: Mapping) -> Dict:
    return translate_classifier(sd)


def translate_attribute_d(sd: Mapping) -> Dict:
    """StyleGAN-D attribute net (ref attribute_net.py). Quirks:
    '.wscale.b' collapses into the WScale module's own 'b' param and the
    'NxN' pyramid blocks get a 'block_' prefix."""
    rules = [
        (r"\.wscale\.b$", ".b"),
        (r"^(\d+x\d+)\.", r"block_\1."),
    ]
    return translate_classifier(sd, pre_rules=rules)


def translate_vit(sd: Mapping) -> Dict:
    """timm DeiT/ViT. Quirks: patch_embed.proj and mlp.fcN merge into single
    module names; cls_token/pos_embed are top-level params."""
    sd = to_numpy_state_dict(strip_module_prefix(sd))
    flat = {}
    for k, v in sd.items():
        if k in ("cls_token", "pos_embed"):
            flat[k] = v
            continue
        k = re.sub(r"^patch_embed\.proj\.", "patch_embed_proj.", k)
        k = re.sub(r"\.mlp\.fc(\d)\.", r".mlp_fc\1.", k)
        parts = k.split(".")
        leaf = parts[-1]
        path = "/".join(_merge_modules(parts[:-1]))
        if leaf == "weight" and v.ndim == 1:
            new_leaf, arr = "scale", v  # LayerNorm
        else:
            new_leaf, arr = _classifier_leaf(leaf, v)
        flat[(path + "/" if path else "") + new_leaf] = arr
    return {"params": _nest(flat)}


def max_res_from_state_dict(sd: Mapping) -> int:
    """Infer attribute-net resolution from keys (ref attribute_net.py:215-219)."""
    res = 4
    for i in range(3, 12):
        if f"{2 ** i}x{2 ** i}.conv0.conv.weight" not in sd:
            break
        res = 2 ** i
    return res  # input resolution equals the largest pyramid block
