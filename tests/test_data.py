"""Data-layer tests with synthesized on-disk datasets."""
import os
import pickle

import numpy as np
import pytest

from diffpure_tpu.data import cifar10_subset, celebahq_subset, imval_transform
from diffpure_tpu.config import dict2namespace, load_config, make_log_dir


@pytest.fixture
def fake_cifar(tmp_path, rng):
    d = tmp_path / "cifar-10-batches-py"
    d.mkdir()
    data = (rng.rand(100, 3072) * 255).astype(np.uint8)
    labels = rng.randint(0, 10, 100).tolist()
    with open(d / "test_batch", "wb") as f:
        pickle.dump({b"data": data, b"labels": labels}, f)
    return str(tmp_path), data, labels


class TestCifar:
    def test_load_and_range(self, fake_cifar):
        root, data, labels = fake_cifar
        x, y = cifar10_subset(root)
        assert x.shape == (100, 32, 32, 3)
        assert x.dtype == np.float32
        assert 0 <= x.min() and x.max() <= 1

    def test_subset_protocol_matches_reference(self, fake_cifar):
        """Same RandomState(data_seed).choice indices as the reference
        (ref datasets.py:333)."""
        root, data, labels = fake_cifar
        x, y = cifar10_subset(root, num_sub=10, data_seed=7)
        idx = np.random.RandomState(7).choice(100, 10, replace=False)
        np.testing.assert_array_equal(y, np.asarray(labels)[idx])

    def test_different_seeds_differ(self, fake_cifar):
        root, *_ = fake_cifar
        _, y1 = cifar10_subset(root, num_sub=20, data_seed=0)
        _, y2 = cifar10_subset(root, num_sub=20, data_seed=1)
        assert not np.array_equal(y1, y2)


@pytest.fixture
def fake_celebahq(tmp_path, rng):
    from PIL import Image
    root = tmp_path / "celebahq"
    (root / "images").mkdir(parents=True)
    n = 20
    names = []
    for i in range(n):
        name = f"{i:06d}.jpg"
        names.append(name)
        arr = (rng.rand(16, 16, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(root / "images" / name)
    attrs = rng.choice([-1, 1], size=(n, 2))
    with open(root / "list_attr_celeba.txt", "w") as f:
        f.write(f"{n}\nEyeglasses Smiling\n")
        for name, a in zip(names, attrs):
            f.write(f"{name} {a[0]} {a[1]}\n")
    with open(root / "list_eval_partition.txt", "w") as f:
        for i, name in enumerate(names):
            f.write(f"{name} {i % 3}\n")
    return str(root), names, attrs


class TestCelebAHQ:
    def test_load_val_partition(self, fake_celebahq):
        root, names, attrs = fake_celebahq
        x, y = celebahq_subset(root, "Smiling", partition="val",
                               fraction=None, base_size=16)
        # val = indices with partition 1
        n_val = sum(1 for i in range(20) if i % 3 == 1)
        assert x.shape == (n_val, 16, 16, 3)
        want = np.maximum(attrs[[i for i in range(20) if i % 3 == 1], 1], 0)
        np.testing.assert_array_equal(y, want)

    def test_fraction_subset(self, fake_celebahq):
        root, *_ = fake_celebahq
        x, y = celebahq_subset(root, "Eyeglasses", partition="train",
                               fraction=50.0, data_seed=1, base_size=16)
        n_train = sum(1 for i in range(20) if i % 3 == 0)
        assert x.shape[0] == int(0.5 * n_train)

    def test_fraction_floor_on_fixture_scale(self, fake_celebahq):
        """The reference's 2% val slice rounds to ZERO images on a
        fixture-scale dataset (int(0.02 * 7) == 0) and np.stack crashes;
        min_count floors the slice to what the caller consumes, capped
        at the partition size."""
        root, *_ = fake_celebahq
        x, y = celebahq_subset(root, "Eyeglasses", partition="val",
                               fraction=2.0, base_size=16, min_count=2)
        assert x.shape[0] == 2
        n_val = sum(1 for i in range(20) if i % 3 == 1)
        x, _ = celebahq_subset(root, "Eyeglasses", partition="val",
                               fraction=2.0, base_size=16,
                               min_count=n_val + 5)   # floor > partition
        assert x.shape[0] == n_val


class TestTransforms:
    def test_imval_resize_center_crop(self, rng):
        from PIL import Image
        img = Image.fromarray((rng.rand(300, 400, 3) * 255).astype(np.uint8))
        out = imval_transform(img, base_size=224)
        assert out.shape == (224, 224, 3)
        assert 0 <= out.min() and out.max() <= 1


class TestConfig:
    def test_dict2namespace_roundtrip(self):
        ns = dict2namespace({"a": {"b": 1, "c": [1, 2]}, "d": "x"})
        assert ns.a.b == 1 and ns.a.c == [1, 2] and ns.d == "x"

    def test_load_reference_style_yaml(self, tmp_path):
        p = tmp_path / "c.yml"
        p.write_text("model:\n  nf: 128\n  ch_mult: [1, 2, 2, 2]\n"
                     "data:\n  image_size: 32\n")
        cfg = load_config(str(p))
        assert cfg.model.nf == 128
        assert cfg.data.image_size == 32

    def test_log_dir_layout(self):
        from types import SimpleNamespace
        args = SimpleNamespace(exp="exp", image_folder="imgs",
                               classifier_name="wrn", diffusion_type="sde",
                               attack_version="rand", seed=3, data_seed=5)
        d = make_log_dir(args)
        assert d == os.path.join("exp", "imgs", "wrn", "sde_rand",
                                 "seed3", "data5")
