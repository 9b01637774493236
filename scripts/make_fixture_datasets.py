"""Build synthetic ./dataset fixtures for hardware CLI runs.

The zero-egress environment has no real CIFAR-10 / ImageNet / CelebA-HQ
files, so end-to-end hardware executions of the CLI protocols use random
images laid out EXACTLY like the reference's dataset roots
(ref datasets.py:110-186,269-336). This validates the full pipeline
mechanics (loaders -> purify -> attacks -> accounting) — not accuracy.

Usage: python scripts/make_fixture_datasets.py [--root ./dataset]
"""
from __future__ import annotations

import argparse
import os
import pickle

import numpy as np


def make_cifar(root, n=64, seed=0):
    d = os.path.join(root, "cifar-10-batches-py")
    os.makedirs(d, exist_ok=True)
    rng = np.random.RandomState(seed)
    data = rng.randint(0, 256, (n, 3072), dtype=np.int64).astype(np.uint8)
    labels = rng.randint(0, 10, n).tolist()
    with open(os.path.join(d, "test_batch"), "wb") as f:
        pickle.dump({b"data": data, b"labels": labels}, f)
    print(f"cifar fixture: {d} ({n} images)")


def make_imagenet(root, n_classes=4, per_class=4, seed=1):
    from PIL import Image
    rng = np.random.RandomState(seed)
    # plausible wnid-style dirnames; sorted order defines class indices
    wnids = [f"n{1440764 + 1000 * i:08d}" for i in range(n_classes)]
    for c, w in enumerate(wnids):
        d = os.path.join(root, "imagenet", "val", w)
        os.makedirs(d, exist_ok=True)
        for i in range(per_class):
            img = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
            Image.fromarray(img).save(os.path.join(d, f"img_{i}.JPEG"))
    print(f"imagenet fixture: {root}/imagenet/val "
          f"({n_classes}x{per_class} images)")


def make_celebahq(root, n=24, seed=2):
    from PIL import Image
    rng = np.random.RandomState(seed)
    d = os.path.join(root, "celebahq")
    os.makedirs(os.path.join(d, "images"), exist_ok=True)
    names = [f"{i:06d}.jpg" for i in range(1, n + 1)]
    for name in names:
        img = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(d, "images", name))
    attr_names = ["Eyeglasses", "Smiling"]
    attrs = rng.choice([-1, 1], size=(n, len(attr_names)))
    with open(os.path.join(d, "list_attr_celeba.txt"), "w") as f:
        f.write(f"{n}\n" + " ".join(attr_names) + "\n")
        for name, a in zip(names, attrs):
            f.write(name + " " + " ".join(str(v) for v in a) + "\n")
    with open(os.path.join(d, "list_eval_partition.txt"), "w") as f:
        for i, name in enumerate(names):
            f.write(f"{name} {i % 3}\n")   # round-robin train/val/test
    print(f"celebahq fixture: {d} ({n} images)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="./dataset")
    args = ap.parse_args()
    make_cifar(args.root)
    make_imagenet(args.root)
    make_celebahq(args.root)


if __name__ == "__main__":
    main()
