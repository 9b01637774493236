"""Dataset loading: CIFAR-10 / ImageNet / CelebA-HQ evaluation subsets.

TPU rebuild of the reference data layer (ref data/datasets.py + utils.py:
256-289): fixed `num_sub` evaluation subsets drawn with
np.random.RandomState(data_seed).choice(N, num_sub, replace=False) —
bit-identical index selection to the reference protocol
(ref datasets.py:319,333) so results are comparable run-to-run.

Filesystem-only (zero-egress environment): CIFAR-10 reads the standard
python-pickle batches; ImageNet reads either a class-per-directory val
folder or the reference's LMDB cache (parsed by the pure-Python reader in
data/lmdb_reader.py — no liblmdb dependency); CelebA-HQ reads images/ +
list_attr_celeba.txt + list_eval_partition.txt exactly like the reference
make_table (ref datasets.py:110-129). All outputs are NHWC float32 in [0,1].
"""
from __future__ import annotations

import os
import pickle
from typing import Optional, Tuple

import numpy as np


# --------------------------------------------------------------------------
# transforms
# --------------------------------------------------------------------------

def _to_float01(img_u8: np.ndarray) -> np.ndarray:
    return img_u8.astype(np.float32) / 255.0


def imval_transform(img, base_size: int = 224) -> np.ndarray:
    """Resize(256)+CenterCrop(base_size) like torchvision 'imval'
    (ref datasets.py:189-254). img: PIL.Image. Returns HWC float [0,1]."""
    from PIL import Image
    w, h = img.size
    scale = 256 / min(w, h)
    img = img.resize((max(int(round(w * scale)), 256),
                      max(int(round(h * scale)), 256)), Image.BILINEAR)
    w, h = img.size
    left = (w - base_size) // 2
    top = (h - base_size) // 2
    img = img.crop((left, top, left + base_size, top + base_size))
    return _to_float01(np.asarray(img.convert("RGB")))


# --------------------------------------------------------------------------
# CIFAR-10
# --------------------------------------------------------------------------

def _load_cifar10_test(root: str) -> Tuple[np.ndarray, np.ndarray]:
    """Read the standard cifar-10-batches-py test batch."""
    path = os.path.join(root, "cifar-10-batches-py", "test_batch")
    with open(path, "rb") as f:
        d = pickle.load(f, encoding="bytes")
    x = d[b"data"].reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
    y = np.asarray(d[b"labels"], dtype=np.int32)
    return _to_float01(x), y


def cifar10_subset(root: str = "./dataset", num_sub: int = -1,
                   data_seed: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """ref datasets.py:329-336 (same RandomState subset indices)."""
    x, y = _load_cifar10_test(root)
    if num_sub > 0:
        idx = np.random.RandomState(data_seed).choice(len(x), num_sub,
                                                      replace=False)
        x, y = x[idx], y[idx]
    return x, y


# --------------------------------------------------------------------------
# ImageNet
# --------------------------------------------------------------------------

def imagenet_val_subset(root: str, num_sub: int = -1, data_seed: int = 0,
                        base_size: int = 224
                        ) -> Tuple[np.ndarray, np.ndarray]:
    """Class-per-directory val folder -> (x, y), reference subset protocol
    (ref datasets.py:311-326). Class index = sorted(dirnames) position,
    matching torchvision ImageFolder."""
    classes = sorted(d for d in os.listdir(root)
                     if os.path.isdir(os.path.join(root, d)))
    samples = []
    for ci, c in enumerate(classes):
        cdir = os.path.join(root, c)
        for fname in sorted(os.listdir(cdir)):
            samples.append((os.path.join(cdir, fname), ci))
    if num_sub > 0:
        idx = np.random.RandomState(data_seed).choice(len(samples), num_sub,
                                                      replace=False)
        samples = [samples[i] for i in idx]
    from PIL import Image
    xs, ys = [], []
    for path, ci in samples:
        with Image.open(path) as img:
            xs.append(imval_transform(img, base_size))
        ys.append(ci)
    return np.stack(xs), np.asarray(ys, dtype=np.int32)


def imagenet_lmdb_val_subset(lmdb_path: str, num_sub: int = -1,
                             data_seed: int = 0, base_size: int = 224
                             ) -> Tuple[np.ndarray, np.ndarray]:
    """Val subset from the reference's LMDB cache (ref datasets.py:269-326):
    keys are the original file paths (ascii), values the raw image bytes
    (ref lmdb_loader, datasets.py:261-265). Parsed by the pure-Python
    reader (data/lmdb_reader.py) — no liblmdb needed. Class index = parent
    directory's rank among sorted class dirs, matching ImageFolder; LMDB's
    byte-sorted full-path iteration reproduces ImageFolder's
    (sorted class, sorted filename) sample order, so the
    RandomState(data_seed) subset indices pick identical images."""
    import io
    from PIL import Image
    from diffpure_tpu.data.lmdb_reader import LMDBReader

    with LMDBReader(lmdb_path) as r:
        keys = list(r.keys())
        def class_of(k: bytes) -> str:
            return os.path.basename(os.path.dirname(k.decode("ascii")))
        classes = sorted({class_of(k) for k in keys})
        cidx = {c: i for i, c in enumerate(classes)}
        samples = [(k, cidx[class_of(k)]) for k in keys]
        if num_sub > 0:
            idx = np.random.RandomState(data_seed).choice(
                len(samples), num_sub, replace=False)
            samples = [samples[i] for i in idx]
        xs, ys = [], []
        for k, ci in samples:
            with Image.open(io.BytesIO(r[k])) as img:
                xs.append(imval_transform(img.convert("RGB"), base_size))
            ys.append(ci)
    return np.stack(xs), np.asarray(ys, dtype=np.int32)


# --------------------------------------------------------------------------
# CelebA-HQ
# --------------------------------------------------------------------------

def _celebahq_table(root: str):
    """ref datasets.py:110-129 (make_table) without pandas."""
    filenames = sorted(os.listdir(os.path.join(root, "images")))
    celebahq = [f.replace("png", "jpg") if f.endswith("png") else f
                for f in filenames]

    attr_path = os.path.join(root, "list_attr_celeba.txt")
    with open(attr_path) as f:
        lines = f.read().splitlines()
    attr_names = lines[1].split()
    attr_rows = {}
    for line in lines[2:]:
        parts = line.split()
        attr_rows[parts[0]] = np.array([int(v) for v in parts[1:]])

    partitions = {}
    with open(os.path.join(root, "list_eval_partition.txt")) as f:
        for line in f:
            fname, part = line.strip().split(" ")
            partitions[fname] = int(part)

    attrs = np.stack([np.maximum(attr_rows[f], 0) for f in celebahq])
    parts = np.array([partitions[f] for f in celebahq])
    return filenames, attr_names, attrs, parts


def celebahq_subset(root: str, attribute: str, partition: str = "val",
                    fraction: Optional[float] = 2.0, data_seed: int = 1,
                    base_size: int = 256, min_count: int = 1
                    ) -> Tuple[np.ndarray, np.ndarray]:
    """ref datasets.py:133-186 (CelebAHQDataset with fraction subsetting).

    `min_count` floors the fraction subset: on the real 30k-image CelebA-HQ
    the reference's 2% slice is ~600 images and the floor never binds, but
    on a fixture-scale dataset int(2% of 8) == 0 would return an empty
    batch — clamp to [min_count, len(partition)] so the caller always gets
    the images it will actually consume.
    """
    filenames, attr_names, attrs, parts = _celebahq_table(root)
    part_to_int = dict(train=0, val=1, test=2)
    partition_idx = np.where(parts == part_to_int[partition])[0]
    if fraction is not None:
        new_length = int(fraction / 100 * len(partition_idx))
        new_length = min(len(partition_idx), max(min_count, new_length))
        rng = np.random.RandomState(data_seed)
        partition_idx = rng.choice(partition_idx, new_length, replace=False)

    ai = attr_names.index(attribute)
    from PIL import Image
    xs, ys = [], []
    for i in partition_idx:
        path = os.path.join(root, "images", filenames[i])
        with Image.open(path) as img:
            img = img.convert("RGB").resize((base_size, base_size),
                                            Image.BILINEAR)
            xs.append(_to_float01(np.asarray(img)))
        ys.append(int(attrs[i, ai]))
    return np.stack(xs), np.asarray(ys, dtype=np.int32)


def load_data(domain: str, num_sub: int, data_seed: int,
              root: str = "./dataset", classifier_name: str = "",
              adv_batch_size: int = 64, shard: int = 0, num_shards: int = 1):
    """Domain dispatch (ref utils.py:256-289). Returns NHWC [0,1] x, y.

    Multi-host: process i of n keeps subset[i::n] — the subset indices are
    identical on every host (same data_seed RandomState), so the shard split
    is deterministic without coordination.
    """
    if "imagenet" in domain:
        # prefer the reference's LMDB cache when present
        # (<val>_faster_imagefolder.lmdb, ref datasets.py:282-283)
        val_dir = os.path.join(root, "imagenet", "val")
        lmdb_dir = val_dir.rstrip("/") + "_faster_imagefolder.lmdb"
        if os.path.isdir(lmdb_dir):
            x, y = imagenet_lmdb_val_subset(lmdb_dir, num_sub=num_sub,
                                            data_seed=data_seed)
        else:
            x, y = imagenet_val_subset(val_dir, num_sub=num_sub,
                                       data_seed=data_seed)
        return x[shard::num_shards], y[shard::num_shards]
    if "cifar10" in domain:
        x, y = cifar10_subset(root, num_sub=num_sub, data_seed=data_seed)
        return x[shard::num_shards], y[shard::num_shards]
    if "celebahq" in domain:
        attribute = classifier_name.split("__")[-1]
        x, y = celebahq_subset(os.path.join(root, "celebahq"), attribute,
                               partition="val", fraction=2.0,
                               data_seed=data_seed,
                               min_count=adv_batch_size)
        x, y = x[:adv_batch_size], y[:adv_batch_size]
        return x[shard::num_shards], y[shard::num_shards]
    raise NotImplementedError(f"unknown domain {domain}")
