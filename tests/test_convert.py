"""Checkpoint-translation parity: flax models vs the reference torch models.

These are the golden-value tests of SURVEY.md §4: the reference models are
instantiated with random weights, the state dict is translated, and outputs
are compared numerically — validating both the translator and every layer of
the flax reimplementations, without needing the pretrained files.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffpure_tpu.models.ncsnpp import NCSNpp
from diffpure_tpu.models.adm_unet import ADMUNet
from diffpure_tpu.models.ddpm_unet import DDPMUNet
from diffpure_tpu.models.convert import (
    translate_ncsnpp, translate_adm, translate_ddpm, apply_ema,
    assert_tree_shapes_match, to_numpy_state_dict, strip_module_prefix,
)

import reference_oracle as ro


def tree_shapes(tree):
    return jax.tree_util.tree_map(lambda x: x.shape, tree)


class TestNCSNppParity:
    def _compare(self, ref_cfg, flax_kwargs, t_values, atol=2e-4):
        import torch
        torch.manual_seed(0)
        ref = ro.load_reference_ncsnpp(ref_cfg)
        sd = ref.state_dict()
        params = translate_ncsnpp(sd)

        model = NCSNpp(**flax_kwargs)
        rng = np.random.RandomState(1)
        B = len(t_values)
        size = ref_cfg.data.image_size
        x = rng.randn(B, 3, size, size).astype(np.float32) * 0.5
        t = np.asarray(t_values, dtype=np.float32)

        with torch.no_grad():
            want = ref(torch.from_numpy(x), torch.from_numpy(t)).numpy()
        got = model.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)),
                          jnp.asarray(t))
        got = np.asarray(got).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=atol)

    def test_small_biggan_parity(self):
        cfg = ro.cifar10_ref_config(model=dict(nf=32, ch_mult=[1, 2],
                                               num_res_blocks=2,
                                               attn_resolutions=[8]),
                                    data=dict(image_size=16))
        self._compare(cfg,
                      dict(image_size=16, nf=32, ch_mult=(1, 2),
                           num_res_blocks=2, attn_resolutions=(8,)),
                      [10.0, 500.0, 999.0])

    def test_small_ddpm_block_parity(self):
        cfg = ro.cifar10_ref_config(model=dict(nf=32, ch_mult=[1, 2],
                                               num_res_blocks=1,
                                               attn_resolutions=[8],
                                               resblock_type="ddpm"),
                                    data=dict(image_size=16))
        self._compare(cfg,
                      dict(image_size=16, nf=32, ch_mult=(1, 2),
                           num_res_blocks=1, attn_resolutions=(8,),
                           resblock_type="ddpm"),
                      [10.0, 500.0])

    def test_small_fourier_fir_parity(self):
        cfg = ro.cifar10_ref_config(model=dict(nf=32, ch_mult=[1, 2],
                                               num_res_blocks=1,
                                               attn_resolutions=[8],
                                               fir=True,
                                               embedding_type="fourier",
                                               fourier_scale=16),
                                    data=dict(image_size=16))
        # fourier embedding takes sigmas (positive reals) as time_cond
        self._compare(cfg,
                      dict(image_size=16, nf=32, ch_mult=(1, 2),
                           num_res_blocks=1, attn_resolutions=(8,),
                           fir=True, embedding_type="fourier",
                           fourier_scale=16.0),
                      [0.5, 12.3])

    def test_full_cifar_structure(self):
        """Translate the full 91-module CIFAR model; audit structure+shapes."""
        cfg = ro.cifar10_ref_config()
        ref = ro.load_reference_ncsnpp(cfg)
        params = translate_ncsnpp(ref.state_dict())
        model = NCSNpp()
        shapes = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 32, 32, 3)), jnp.zeros((1,))))
        assert_tree_shapes_match(params["params"], shapes["params"])

    def test_full_cifar_forward_parity(self):
        """End-to-end numeric parity on the full 107M-param CIFAR model."""
        import torch
        cfg = ro.cifar10_ref_config()
        torch.manual_seed(0)
        ref = ro.load_reference_ncsnpp(cfg)
        params = translate_ncsnpp(ref.state_dict())
        model = NCSNpp()
        rng = np.random.RandomState(2)
        x = rng.randn(1, 3, 32, 32).astype(np.float32) * 0.5
        t = np.array([99.9], dtype=np.float32)  # continuous t*999 style
        with torch.no_grad():
            want = ref(torch.from_numpy(x), torch.from_numpy(t)).numpy()
        got = np.asarray(model.apply(
            params, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(t)))
        got = got.transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=5e-4)


class TestADMParity:
    SMALL = dict(image_size=32, in_channels=3, model_channels=32,
                 out_channels=6, num_res_blocks=1, attention_resolutions=(4,),
                 dropout=0.0, channel_mult=(1, 2), num_head_channels=16,
                 use_scale_shift_norm=True, resblock_updown=True)

    def _compare(self, ref_kwargs, flax_kwargs, atol=2e-4):
        import torch
        torch.manual_seed(0)
        ref = ro.load_reference_adm(**ref_kwargs)
        params = translate_adm(ref.state_dict())
        model = ADMUNet(**flax_kwargs)
        rng = np.random.RandomState(3)
        size = ref_kwargs["image_size"]
        x = rng.randn(2, 3, size, size).astype(np.float32) * 0.5
        t = np.array([100, 750], dtype=np.int64)
        with torch.no_grad():
            want = ref(torch.from_numpy(x), torch.from_numpy(t)).numpy()
        got = np.asarray(model.apply(
            params, jnp.asarray(x.transpose(0, 2, 3, 1)),
            jnp.asarray(t.astype(np.int32))))
        got = got.transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=atol)

    def test_small_parity(self):
        self._compare(self.SMALL, self.SMALL)

    def test_small_parity_no_resblock_updown(self):
        kw = dict(self.SMALL, resblock_updown=False)
        self._compare(kw, kw)

    def test_small_parity_new_attention_order(self):
        kw = dict(self.SMALL, use_new_attention_order=True)
        self._compare(kw, kw)

    def test_small_parity_no_scale_shift(self):
        kw = dict(self.SMALL, use_scale_shift_norm=False)
        self._compare(kw, kw)

    def test_imagenet256_structure(self):
        """Key-level audit of the full 552M translation without running it."""
        import torch
        from diffpure_tpu.models.adm_unet import imagenet256_config
        ref_kwargs = dict(image_size=256, in_channels=3, model_channels=256,
                          out_channels=6, num_res_blocks=2,
                          attention_resolutions=(8, 16, 32), dropout=0.0,
                          channel_mult=(1, 1, 2, 2, 4, 4), num_heads=4,
                          num_head_channels=64, use_scale_shift_norm=True,
                          resblock_updown=True)
        with torch.device("meta"):
            ref = ro.load_reference_adm(**ref_kwargs)
        sd = {k: np.zeros(v.shape, dtype=np.float32)
              for k, v in ref.state_dict().items()}
        params = translate_adm(sd)
        model = ADMUNet(**imagenet256_config(use_bf16=False))
        shapes = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 256, 256, 3)),
                               jnp.zeros((1,), jnp.int32)))
        assert_tree_shapes_match(params["params"], shapes["params"])


class TestDDPMParity:
    def test_small_parity(self):
        import torch
        torch.manual_seed(0)
        cfg = ro.celeba_ref_config(image_size=32, ch=32, ch_mult=[1, 2],
                                   num_res_blocks=1, attn_resolutions=[16])
        ref = ro.load_reference_ddpm(cfg)
        params = translate_ddpm(ref.state_dict())
        model = DDPMUNet(resolution=32, ch=32, ch_mult=(1, 2),
                         num_res_blocks=1, attn_resolutions=(16,))
        rng = np.random.RandomState(4)
        x = rng.randn(2, 3, 32, 32).astype(np.float32) * 0.5
        t = np.array([100, 900], dtype=np.int64)
        with torch.no_grad():
            want = ref(torch.from_numpy(x), torch.from_numpy(t)).numpy()
        got = np.asarray(model.apply(
            params, jnp.asarray(x.transpose(0, 2, 3, 1)),
            jnp.asarray(t.astype(np.int32))))
        got = got.transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)

    def test_celebahq_structure(self):
        import torch
        cfg = ro.celeba_ref_config()
        with torch.device("meta"):
            ref = ro.load_reference_ddpm(cfg)
        sd = {k: np.zeros(v.shape, dtype=np.float32)
              for k, v in ref.state_dict().items()}
        params = translate_ddpm(sd)
        model = DDPMUNet()
        shapes = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 256, 256, 3)),
                               jnp.zeros((1,), jnp.int32)))
        assert_tree_shapes_match(params["params"], shapes["params"])


class TestCheckpointPlumbing:
    def test_apply_ema(self):
        sd = {"sigmas": np.zeros(10), "a.weight": np.ones((2, 2)),
              "b.bias": np.ones(3)}
        ema = {"shadow_params": [np.full((2, 2), 5.0), np.full(3, 7.0)]}
        out = apply_ema(sd, ema)
        np.testing.assert_allclose(out["a.weight"], 5.0)
        np.testing.assert_allclose(out["b.bias"], 7.0)
        np.testing.assert_allclose(out["sigmas"], 0.0)

    def test_strip_module_prefix(self):
        sd = {"module.a.w": 1, "b.w": 2}
        out = strip_module_prefix(sd)
        assert set(out) == {"a.w", "b.w"}

    def test_score_sde_full_flow(self, tmp_path):
        """Round-trip a synthetic score_sde checkpoint file."""
        import torch
        cfg = ro.cifar10_ref_config(model=dict(nf=32, ch_mult=[1, 2],
                                               num_res_blocks=1,
                                               attn_resolutions=[8]),
                                    data=dict(image_size=16))
        torch.manual_seed(0)
        ref = ro.load_reference_ncsnpp(cfg)
        shadow = [p.detach().clone() * 0.5 for p in ref.parameters()]
        ckpt = {"model": ref.state_dict(),
                "ema": {"shadow_params": shadow},
                "optimizer": None, "step": 123}
        path = tmp_path / "checkpoint_8.pth"
        torch.save(ckpt, path)

        from diffpure_tpu.models.convert import load_score_sde_checkpoint
        params = load_score_sde_checkpoint(str(path))
        # EMA=0.5*weights must differ from the raw translation by exactly 0.5
        raw = translate_ncsnpp(ref.state_dict())
        k0 = jax.tree_util.tree_leaves(params)[0]
        r0 = jax.tree_util.tree_leaves(raw)[0]
        np.testing.assert_allclose(np.asarray(k0), 0.5 * np.asarray(r0),
                                   rtol=1e-6)


class TestNCSNppProgressiveParity:
    """The progressive/FIR config space (used by score_sde's CelebA/church
    checkpoints) against the reference implementation."""

    def test_output_skip_input_skip_fir(self):
        cfg = ro.cifar10_ref_config(
            model=dict(nf=32, ch_mult=[1, 2], num_res_blocks=1,
                       attn_resolutions=[8], fir=True,
                       progressive="output_skip",
                       progressive_input="input_skip",
                       progressive_combine="sum"),
            data=dict(image_size=16))
        TestNCSNppParity()._compare(
            cfg,
            dict(image_size=16, nf=32, ch_mult=(1, 2), num_res_blocks=1,
                 attn_resolutions=(8,), fir=True, progressive="output_skip",
                 progressive_input="input_skip", progressive_combine="sum"),
            [10.0, 500.0])

    def test_residual_residual_fir(self):
        ro.patch_fir_upsample_conv()  # reference negative-stride flip bug
        cfg = ro.cifar10_ref_config(
            model=dict(nf=32, ch_mult=[1, 2], num_res_blocks=1,
                       attn_resolutions=[8], fir=True,
                       progressive="residual",
                       progressive_input="residual",
                       progressive_combine="sum"),
            data=dict(image_size=16))
        TestNCSNppParity()._compare(
            cfg,
            dict(image_size=16, nf=32, ch_mult=(1, 2), num_res_blocks=1,
                 attn_resolutions=(8,), fir=True, progressive="residual",
                 progressive_input="residual", progressive_combine="sum"),
            [10.0, 500.0])

    def test_input_skip_cat_combiner(self):
        cfg = ro.cifar10_ref_config(
            model=dict(nf=32, ch_mult=[1, 2], num_res_blocks=1,
                       attn_resolutions=[8], fir=False,
                       progressive="none",
                       progressive_input="input_skip",
                       progressive_combine="cat"),
            data=dict(image_size=16))
        TestNCSNppParity()._compare(
            cfg,
            dict(image_size=16, nf=32, ch_mult=(1, 2), num_res_blocks=1,
                 attn_resolutions=(8,), fir=False, progressive="none",
                 progressive_input="input_skip", progressive_combine="cat"),
            [10.0, 500.0])
