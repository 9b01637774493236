"""PyTorch checkpoint -> flax params translation.

Handles the three reference checkpoint formats (SURVEY.md §5.4):
  1. score_sde: dict {model, ema, optimizer, step}; params are then
     overwritten with the EMA shadow params (ref runners/diffpure_sde.py:178-182,
     score_sde/models/ema.py:18-105).
  2. guided_diffusion: flat state_dict (256x256_diffusion_uncond.pt,
     ref runners/diffpure_guided.py:30-35).
  3. SDEdit CelebA-HQ: flat state_dict (ref runners/diffpure_ddpm.py:68-74).

The flax modules were built with reference-mirroring names, so translation is
a key rewrite plus layout transforms:
  - conv OIHW -> HWIO; 1D conv (out,in,1) -> dense (in,out);
    linear (out,in) -> (in,out); norm weight -> scale.

All functions take/return plain dicts of numpy arrays; torch is only needed
for unpickling actual .pt files (load_torch_state_dict).
"""
from __future__ import annotations

import os
import re
from typing import Dict, Mapping, Tuple

import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Unpickle a torch checkpoint into numpy arrays (CPU-only)."""
    import torch
    state = torch.load(path, map_location="cpu", weights_only=False)
    return state


def to_numpy_state_dict(sd: Mapping) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in sd.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        out[k] = np.asarray(v)
    return out


def strip_module_prefix(sd: Mapping[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Drop DataParallel 'module.' prefixes (ref utils.py:119-127)."""
    return {(k[len("module."):] if k.startswith("module.") else k): v
            for k, v in sd.items()}


def apply_ema(model_sd: Dict[str, np.ndarray], ema_state: Mapping,
              buffer_keys: Tuple[str, ...] = ("sigmas",)) -> Dict[str, np.ndarray]:
    """Overwrite parameters with EMA shadow params.

    shadow_params is a flat list in model.parameters() order == state_dict
    order minus buffers (ref score_sde/models/ema.py:18-105).
    """
    shadow = [np.asarray(p.detach().cpu().numpy() if hasattr(p, "detach")
                         else p) for p in ema_state["shadow_params"]]
    param_keys = [k for k in model_sd
                  if not any(k == b or k.endswith("." + b) for b in buffer_keys)]
    assert len(param_keys) == len(shadow), (len(param_keys), len(shadow))
    out = dict(model_sd)
    for k, p in zip(param_keys, shadow):
        assert out[k].shape == p.shape, (k, out[k].shape, p.shape)
        out[k] = p
    return out


# --------------------------------------------------------------------------
# leaf transforms
# --------------------------------------------------------------------------

def _leaf(name: str, v: np.ndarray) -> Tuple[str, np.ndarray]:
    """Map a torch (leaf_name, tensor) to flax (leaf_name, array)."""
    if name == "weight":
        if v.ndim == 4:  # conv OIHW -> HWIO
            return "kernel", v.transpose(2, 3, 1, 0)
        if v.ndim == 3:  # conv1d (out, in, 1) -> dense (in, out)
            return "kernel", v[:, :, 0].transpose(1, 0)
        if v.ndim == 2:  # linear (out, in) -> (in, out)
            return "kernel", v.transpose(1, 0)
        if v.ndim == 1:  # norm scale
            return "scale", v
    if name == "bias":
        return "bias", v
    if name in ("W", "b"):  # NIN / GaussianFourierProjection
        return name, v
    raise ValueError(f"unhandled leaf {name} with shape {v.shape}")


def _nest(flat: Dict[str, np.ndarray]) -> Dict:
    """'a/b/c' keys -> nested dict."""
    tree: Dict = {}
    for k, v in flat.items():
        parts = k.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


# --------------------------------------------------------------------------
# per-model key rewrites
# --------------------------------------------------------------------------

def ncsnpp_key(torch_key: str) -> str | None:
    """all_modules.{i}.{sub...} -> m{i}/{sub...}; None to skip buffers."""
    if torch_key == "sigmas":
        return None
    m = re.match(r"all_modules\.(\d+)\.(.*)", torch_key)
    if m:
        idx, rest = m.groups()
        parts = rest.split(".")
        return "/".join([f"m{idx}"] + parts[:-1]), parts[-1]
    # bare param on a module with direct params (NIN at top level: none in
    # practice, but GaussianFourierProjection is all_modules.0.W -> matched
    # above). Anything else is unexpected.
    raise ValueError(f"unexpected NCSN++ key {torch_key}")


def adm_key(torch_key: str):
    """guided_diffusion state-dict key -> flax path.

    input_blocks.4.0.in_layers.0.weight -> input_blocks_4_0/in_layers_0 + leaf.
    """
    parts = torch_key.split(".")
    leaf = parts[-1]
    mods = parts[:-1]
    if not mods:
        raise ValueError(torch_key)
    # Merge leading [name, digits...] runs into flax module names.
    out = []
    i = 0
    while i < len(mods):
        name = mods[i]
        i += 1
        while i < len(mods) and mods[i].isdigit():
            name += "_" + mods[i]
            i += 1
        out.append(name)
    # label_emb is an nn.Embedding: weight -> embedding (no transpose)
    if out[0] == "label_emb" and leaf == "weight":
        return "/".join(out), ("embedding", None)
    return "/".join(out), leaf


def ddpm_key(torch_key: str):
    """SDEdit state-dict key -> flax path.

    down.0.block.1.norm1.weight -> down_0_block_1/norm1 + leaf;
    temb.dense.0.weight -> temb_dense_0.
    """
    parts = torch_key.split(".")
    leaf = parts[-1]
    mods = parts[:-1]
    # Collapse [down, i, block, j] style paths into one module name,
    # but keep true submodules (norm1, conv1, q, ...) separate: the last
    # non-digit segment before the leaf is the inner module.
    merged = []
    i = 0
    while i < len(mods):
        name = mods[i]
        i += 1
        while i < len(mods) and mods[i].isdigit():
            name += "_" + mods[i]
            i += 1
        merged.append(name)
    # Outer container names glue together: down_0 + block_1 -> down_0_block_1
    inner = merged[-1]
    outer = "_".join(merged[:-1])
    if outer:
        # temb_dense_0 etc. have no inner module (Linear directly)
        if inner in ("norm1", "conv1", "temb_proj", "norm2", "conv2",
                     "nin_shortcut", "conv_shortcut", "norm", "q", "k", "v",
                     "proj_out", "conv"):
            return f"{outer}_{inner}" if inner == "conv" else f"{outer}/{inner}", leaf
        return f"{outer}_{inner}", leaf
    return inner, leaf


def translate_ncsnpp(sd: Mapping[str, np.ndarray]) -> Dict:
    sd = to_numpy_state_dict(strip_module_prefix(sd))
    flat = {}
    for k, v in sd.items():
        mapped = ncsnpp_key(k)
        if mapped is None:
            continue
        path, leaf_name = mapped
        new_leaf, arr = _leaf(leaf_name, v)
        flat[f"{path}/{new_leaf}"] = arr
    return {"params": _nest(flat)}


def translate_adm(sd: Mapping[str, np.ndarray]) -> Dict:
    sd = to_numpy_state_dict(strip_module_prefix(sd))
    flat = {}
    for k, v in sd.items():
        path, leaf_name = adm_key(k)
        if isinstance(leaf_name, tuple):  # embedding special case
            flat[f"{path}/{leaf_name[0]}"] = v
            continue
        new_leaf, arr = _leaf(leaf_name, v)
        flat[f"{path}/{new_leaf}"] = arr
    return {"params": _nest(flat)}


def translate_ddpm(sd: Mapping[str, np.ndarray]) -> Dict:
    sd = to_numpy_state_dict(strip_module_prefix(sd))
    flat = {}
    for k, v in sd.items():
        path, leaf_name = ddpm_key(k)
        new_leaf, arr = _leaf(leaf_name, v)
        flat[f"{path}/{new_leaf}"] = arr
    return {"params": _nest(flat)}


def translate_ncsnv2(sd: Mapping[str, np.ndarray]) -> Dict:
    """NCSNv2/NCSN family: digit-run merge plus the norm-zoo leaves
    (alpha/gamma/beta params, conditional `embed.weight` kept untransposed)."""
    sd = to_numpy_state_dict(strip_module_prefix(sd))
    flat = {}
    for k, v in sd.items():
        if k == "sigmas":
            continue
        parts = k.split(".")
        leaf = parts[-1]
        mods = parts[:-1]
        merged = []
        i = 0
        while i < len(mods):
            name = mods[i]
            i += 1
            while i < len(mods) and mods[i].isdigit():
                name += "_" + mods[i]
                i += 1
            merged.append(name)
        path = "/".join(merged)
        if merged and merged[-1] == "embed" and leaf == "weight":
            flat[f"{path}/embedding"] = v
            continue
        if leaf in ("alpha", "gamma", "beta"):
            flat[f"{path}/{leaf}"] = v
            continue
        new_leaf, arr = _leaf(leaf, v)
        flat[(path + "/" if path else "") + new_leaf] = arr
    return {"params": _nest(flat)}


def load_score_sde_checkpoint(path: str) -> Dict:
    """Full score_sde flow: load, apply EMA, translate
    (ref runners/diffpure_sde.py:160-190)."""
    state = load_torch_state_dict(path)
    model_sd = to_numpy_state_dict(strip_module_prefix(state["model"]))
    model_sd = apply_ema(model_sd, state["ema"])
    return translate_ncsnpp(model_sd)


def load_guided_diffusion_checkpoint(path: str) -> Dict:
    return translate_adm(load_torch_state_dict(path))


def load_sdedit_checkpoint(path: str) -> Dict:
    return translate_ddpm(load_torch_state_dict(path))


def cached_translate(path: str, translate_fn, cache_dir: str = ".ckpt_cache"
                     ) -> Dict:
    """Translate once, orbax-cache the flax pytree for fast reloads.

    Torch unpickling + key rewrites of the 552M ADM checkpoint cost tens of
    seconds; the orbax copy restores in ~1s and is the natural on-disk
    format for sharded multi-host loading (replaces the reference's
    rank-0 byte broadcast, ref dist_util.py:63-83).
    """
    import hashlib
    import orbax.checkpoint as ocp

    tag = hashlib.sha1(
        f"{os.path.abspath(path)}:{os.path.getmtime(path)}".encode()
    ).hexdigest()[:16]
    cache_path = os.path.abspath(os.path.join(cache_dir, tag))
    if os.path.exists(cache_path):
        with ocp.StandardCheckpointer() as ckptr:
            return ckptr.restore(cache_path)
    params = translate_fn(path)
    os.makedirs(cache_dir, exist_ok=True)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(cache_path, params)
    return params


def assert_tree_shapes_match(translated: Dict, init_shapes: Dict,
                             path: str = "") -> None:
    """Structural + shape audit of a translated tree vs model.init shapes."""
    t_keys = set(translated)
    i_keys = set(init_shapes)
    if t_keys != i_keys:
        missing = i_keys - t_keys
        extra = t_keys - i_keys
        raise ValueError(f"at {path or '<root>'}: missing={sorted(missing)} "
                         f"extra={sorted(extra)}")
    for k in t_keys:
        tv, iv = translated[k], init_shapes[k]
        if isinstance(iv, dict):
            assert_tree_shapes_match(tv, iv, f"{path}/{k}")
        else:
            t_shape = tuple(tv.shape)
            i_shape = tuple(iv.shape)
            if t_shape != i_shape:
                raise ValueError(f"shape mismatch at {path}/{k}: "
                                 f"ckpt {t_shape} vs model {i_shape}")
