"""SSIM vs torch oracle; discretization checks."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffpure_tpu.utils.ssim import ssim
from diffpure_tpu.attacks.discretization import (
    discretize_image, discretized_adversarial_check,
)
from tests.test_attacks import make_linear_model


class TestSSIM:
    def test_identical_images(self, rng):
        x = jnp.asarray(rng.rand(2, 16, 16, 3).astype(np.float32))
        assert float(ssim(x, x)) > 0.999

    def test_noise_reduces_ssim(self, rng, key):
        x = jnp.asarray(rng.rand(2, 16, 16, 3).astype(np.float32))
        y = jnp.clip(x + 0.3 * jax.random.normal(key, x.shape), 0, 1)
        assert float(ssim(x, y)) < 0.8

    def test_matches_reference_pytorch_ssim(self, rng):
        import reference_oracle as ro
        import torch
        ro._patch_cpp_extension()
        ro.add_reference_path()
        from stadv_eot.recoloradv.mister_ed.utils.pytorch_ssim import ssim \
            as ref_ssim
        x = rng.rand(2, 3, 16, 16).astype(np.float32)
        y = np.clip(x + rng.randn(2, 3, 16, 16).astype(np.float32) * 0.1,
                    0, 1)
        want = float(ref_ssim(torch.from_numpy(x), torch.from_numpy(y)))
        got = float(ssim(jnp.asarray(x.transpose(0, 2, 3, 1)),
                         jnp.asarray(y.transpose(0, 2, 3, 1))))
        np.testing.assert_allclose(got, want, atol=2e-3)


class TestDiscretize:
    def test_round_is_8bit_grid(self, rng):
        x = jnp.asarray(rng.rand(2, 4, 4, 3).astype(np.float32))
        q = discretize_image(x, "round")
        scaled = np.asarray(q) * 255
        np.testing.assert_allclose(scaled, np.round(scaled), atol=1e-4)
        assert float(jnp.abs(q - x).max()) <= 0.5 / 255 + 1e-6

    def test_random_rounding_unbiased(self, key):
        x = jnp.full((1, 50, 50, 1), 0.5 + 0.3 / 255)
        q = discretize_image(x, "random", key=key)
        np.testing.assert_allclose(float(q.mean()), float(x.mean()),
                                   atol=2e-4)

    def test_adversarial_check(self, rng, key):
        W = np.stack([rng.randn(48), -rng.randn(48)], 1).astype(np.float32)
        model_fn = make_linear_model(W)
        x = jnp.asarray(rng.rand(4, 4, 4, 3).astype(np.float32))
        y = jnp.argmax(model_fn(x, None), -1)
        found = discretized_adversarial_check(model_fn, x, y, key)
        assert not np.asarray(found).any()  # clean inputs stay correct
