"""Training image pipeline, image dumps, ADM classifier/SR factories."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture
def image_dir(tmp_path, rng):
    from PIL import Image
    for cls in ["cat", "dog"]:
        for i in range(6):
            arr = (rng.rand(40, 48, 3) * 255).astype(np.uint8)
            Image.fromarray(arr).save(tmp_path / f"{cls}_{i:03d}.png")
    return str(tmp_path)


class TestImageDatasets:
    def test_listing_and_batches(self, image_dir):
        from diffpure_tpu.data.image_datasets import (
            list_image_files_recursively, load_data,
        )
        files = list_image_files_recursively(image_dir)
        assert len(files) == 12
        it = load_data(data_dir=image_dir, batch_size=4, image_size=16,
                       class_cond=True, seed=0)
        batch, kwargs = next(it)
        assert batch.shape == (4, 16, 16, 3)
        assert batch.min() >= -1 and batch.max() <= 1
        assert kwargs["y"].shape == (4,)
        assert set(np.unique(kwargs["y"])) <= {0, 1}

    def test_sharding_partitions_files(self, image_dir):
        from diffpure_tpu.data.image_datasets import load_data
        it0 = load_data(data_dir=image_dir, batch_size=2, image_size=16,
                        deterministic=True, shard=0, num_shards=2,
                        random_flip=False)
        it1 = load_data(data_dir=image_dir, batch_size=2, image_size=16,
                        deterministic=True, shard=1, num_shards=2,
                        random_flip=False)
        b0, _ = next(it0)
        b1, _ = next(it1)
        assert not np.allclose(b0, b1)

    def test_center_crop(self, rng):
        from PIL import Image
        from diffpure_tpu.data.image_datasets import center_crop_arr
        img = Image.fromarray((rng.rand(100, 80, 3) * 255).astype(np.uint8))
        arr = center_crop_arr(img, 32)
        assert arr.shape == (32, 32, 3)


class TestImageDumps:
    def test_grid_and_save(self, tmp_path, rng):
        from diffpure_tpu.utils.images import make_grid, save_image
        imgs = rng.rand(5, 8, 8, 3).astype(np.float32)
        grid = make_grid(imgs, nrow=4)
        assert grid.shape[-1] == 3
        path = tmp_path / "g.png"
        save_image(imgs, str(path))
        assert path.exists()

    def test_purification_debug_dump(self, tmp_path, rng):
        from diffpure_tpu.utils.images import dump_purification_debug
        x = rng.rand(2, 8, 8, 3).astype(np.float32) * 2 - 1
        dump_purification_debug(str(tmp_path), 0, "t", x_input=x,
                                x_purified=x)
        assert (tmp_path / "bs0_t" / "original_input.png").exists()
        assert (tmp_path / "bs0_t" / "samples_0.npy").exists()
        # beyond max_batches: no-op
        dump_purification_debug(str(tmp_path), 5, "t", x_input=x)
        assert not (tmp_path / "bs5_t").exists()


class TestADMFactoryExtensions:
    def test_create_classifier(self, key):
        from diffpure_tpu.models.factories import (
            classifier_defaults, create_classifier,
        )
        d = classifier_defaults()
        d.update(image_size=64, classifier_width=64, classifier_depth=1,
                 classifier_attention_resolutions="16")
        clf = create_classifier(**d)
        x = jnp.zeros((1, 64, 64, 3))
        t = jnp.array([0])
        p = clf.init(key, x, t)
        assert clf.apply(p, x, t).shape == (1, 1000)

    def test_sr_create_model(self, key):
        from diffpure_tpu.models.factories import sr_create_model
        m = sr_create_model(64, 16, num_channels=32, num_res_blocks=1,
                            attention_resolutions="16",
                            num_head_channels=16, learn_sigma=True)
        x = jnp.zeros((1, 64, 64, 3))
        lr = jnp.zeros((1, 16, 16, 3))
        p = m.init(key, x, jnp.array([10]), low_res=lr)
        assert m.apply(p, x, jnp.array([10]), low_res=lr).shape == (1, 64, 64, 6)
