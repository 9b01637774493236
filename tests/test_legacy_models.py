"""Parity tests for the legacy score models (score_sde 'ddpm', NCSNv2)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import reference_oracle as ro
from diffpure_tpu.models.convert import translate_ncsnpp, translate_ncsnv2
from diffpure_tpu.models.ddpm_v1 import DDPM
from diffpure_tpu.models.ncsnv2 import NCSNv2


class TestDDPMv1Parity:
    def test_small_parity(self):
        import torch
        cfg = ro.cifar10_ref_config(
            model=dict(nf=32, ch_mult=[1, 2], num_res_blocks=1,
                       attn_resolutions=[8]),
            data=dict(image_size=16))
        ro._patch_cpp_extension()
        ro.add_reference_path()
        from score_sde.models import ddpm as ref_ddpm
        torch.manual_seed(0)
        ref = ref_ddpm.DDPM(cfg).eval()
        params = translate_ncsnpp(ref.state_dict())

        model = DDPM(image_size=16, nf=32, ch_mult=(1, 2), num_res_blocks=1,
                     attn_resolutions=(8,))
        rng = np.random.RandomState(1)
        x = rng.randn(2, 3, 16, 16).astype(np.float32) * 0.5
        labels = np.array([10.0, 500.0], dtype=np.float32)
        with torch.no_grad():
            want = ref(torch.from_numpy(x), torch.from_numpy(labels)).numpy()
        got = np.asarray(model.apply(
            params, jnp.asarray(x.transpose(0, 2, 3, 1)),
            jnp.asarray(labels)))
        got = got.transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)


class TestNCSNv2Parity:
    def test_small_parity(self):
        import torch
        cfg = ro.cifar10_ref_config(
            model=dict(nf=32, normalization="InstanceNorm++",
                       nonlinearity="elu", scale_by_sigma=True,
                       sigma_min=0.01, sigma_max=50, num_scales=100),
            data=dict(image_size=32, centered=False, channels=3))
        ro.patch_ncsn_conv_bias_bug()
        from score_sde.models import ncsnv2 as ref_ncsnv2
        torch.manual_seed(0)
        ref = ref_ncsnv2.NCSNv2(cfg).eval()
        params = translate_ncsnv2(ref.state_dict())

        model = NCSNv2(image_size=32, nf=32, centered=False,
                       scale_by_sigma=True, sigma_min=0.01, sigma_max=50.0,
                       num_scales=100)
        rng = np.random.RandomState(2)
        x = rng.rand(2, 3, 32, 32).astype(np.float32)
        labels = np.array([5, 50], dtype=np.int64)
        with torch.no_grad():
            want = ref(torch.from_numpy(x), torch.from_numpy(labels)).numpy()
        got = np.asarray(model.apply(
            params, jnp.asarray(x.transpose(0, 2, 3, 1)),
            jnp.asarray(labels.astype(np.int32))))
        got = got.transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-3)

    def test_dispatch(self):
        from diffpure_tpu.models.ncsnv2 import get_network, NCSNv2_128, \
            NCSNv2_256
        assert get_network(64) is NCSNv2
        assert get_network(128) is NCSNv2_128
        assert get_network(256) is NCSNv2_256


class TestNormalizationZoo:
    def test_instance_norm_plus_matches_torch(self, rng):
        import torch
        ro._patch_cpp_extension()
        ro.add_reference_path()
        from score_sde.models import normalization as ref_norm
        from diffpure_tpu.models.normalization import InstanceNorm2dPlus

        torch.manual_seed(3)
        refm = ref_norm.InstanceNorm2dPlus(16).eval()
        x = rng.randn(2, 16, 8, 8).astype(np.float32)
        with torch.no_grad():
            want = refm(torch.from_numpy(x)).numpy()

        m = InstanceNorm2dPlus()
        params = {"params": {
            "alpha": jnp.asarray(refm.alpha.detach().numpy()),
            "gamma": jnp.asarray(refm.gamma.detach().numpy()),
            "beta": jnp.asarray(refm.beta.detach().numpy()),
        }}
        got = np.asarray(m.apply(params,
                                 jnp.asarray(x.transpose(0, 2, 3, 1))))
        np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want,
                                   rtol=1e-3, atol=1e-4)

    def test_conditional_variants_run(self, rng, key):
        from diffpure_tpu.models.normalization import (
            ConditionalInstanceNorm2dPlus, ConditionalVarianceNorm2d,
            ConditionalNoneNorm2d, VarianceNorm2d, NoneNorm2d,
        )
        x = jnp.asarray(rng.randn(2, 8, 8, 16).astype(np.float32))
        y = jnp.array([1, 3])
        for M in [ConditionalInstanceNorm2dPlus, ConditionalVarianceNorm2d,
                  ConditionalNoneNorm2d]:
            m = M(num_classes=10)
            p = m.init(key, x, y)
            out = m.apply(p, x, y)
            assert out.shape == x.shape
        for M in [VarianceNorm2d, NoneNorm2d]:
            m = M()
            p = m.init(key, x)
            assert m.apply(p, x).shape == x.shape
