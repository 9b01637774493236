"""Model-level tests: shapes, determinism, param counts vs reference."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffpure_tpu.models import create_model
from diffpure_tpu.models.adm_unet import ADMUNet, imagenet256_config
from diffpure_tpu.models.ddpm_unet import DDPMUNet
from diffpure_tpu.models.ncsnpp import NCSNpp
from diffpure_tpu.models.layers import (
    get_timestep_embedding, adm_timestep_embedding,
)


def count_params(tree):
    return sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(tree))


def shape_params(model, *args, **kwargs):
    """Parameter shapes without allocation."""
    return jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), *args,
                                             **kwargs))


class TestTimestepEmbedding:
    def test_ddpm_matches_torch(self):
        """sin-first, /(half-1) (ref layers.py:515-532)."""
        import math
        import torch
        t = np.array([0.0, 10.0, 999.0], dtype=np.float32)
        got = np.asarray(get_timestep_embedding(jnp.asarray(t), 128))
        half = 64
        emb = math.log(10000) / (half - 1)
        emb = torch.exp(torch.arange(half, dtype=torch.float32) * -emb)
        emb = torch.from_numpy(t)[:, None] * emb[None, :]
        want = torch.cat([torch.sin(emb), torch.cos(emb)], dim=1).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_adm_matches_torch(self):
        """cos-first, /half (ref nn.py:110-128)."""
        import math
        import torch
        t = np.array([0.0, 500.0], dtype=np.float32)
        got = np.asarray(adm_timestep_embedding(jnp.asarray(t), 256))
        half = 128
        freqs = torch.exp(-math.log(10000)
                          * torch.arange(half, dtype=torch.float32) / half)
        args = torch.from_numpy(t)[:, None] * freqs[None]
        want = torch.cat([torch.cos(args), torch.sin(args)], dim=-1).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_conventions_differ(self):
        """The two embeddings must NOT match (silent-mismatch trap)."""
        t = jnp.array([7.0])
        a = get_timestep_embedding(t, 64)
        b = adm_timestep_embedding(t, 64)
        assert not np.allclose(np.asarray(a), np.asarray(b))


class TestNCSNpp:
    @pytest.fixture(scope="class")
    def small_model(self):
        model = NCSNpp(image_size=16, nf=16, ch_mult=(1, 2), num_res_blocks=1,
                       attn_resolutions=(8,), num_scales=100)
        x = jnp.zeros((2, 16, 16, 3))
        t = jnp.array([10.0, 50.0])
        params = model.init(jax.random.PRNGKey(0), x, t)
        return model, params

    def test_forward_shape(self, small_model):
        model, params = small_model
        x = jnp.ones((2, 16, 16, 3)) * 0.1
        t = jnp.array([10.0, 50.0])
        out = model.apply(params, x, t)
        assert out.shape == (2, 16, 16, 3)
        assert np.isfinite(np.asarray(out)).all()

    def test_deterministic(self, small_model):
        model, params = small_model
        x = jnp.ones((2, 16, 16, 3)) * 0.1
        t = jnp.array([10.0, 50.0])
        o1 = model.apply(params, x, t)
        o2 = model.apply(params, x, t)
        np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))

    def test_jittable_and_grad(self, small_model):
        model, params = small_model

        @jax.jit
        def loss(p, x):
            return jnp.sum(model.apply(p, x, jnp.array([10.0, 50.0])) ** 2)

        x = jnp.ones((2, 16, 16, 3)) * 0.1
        g = jax.grad(loss, argnums=1)(params, x)
        assert np.isfinite(np.asarray(g)).all()

    def test_cifar_deep_param_count(self):
        """DiffPure CIFAR-10 NCSN++ deep: ~107.6M params
        (nf=128, ch_mult 1222, 8 res blocks; configs/cifar10.yml:22-26)."""
        model = NCSNpp()
        shapes = shape_params(model, jnp.zeros((1, 32, 32, 3)),
                              jnp.zeros((1,)))
        n = count_params(shapes)
        assert 90e6 < n < 120e6, n

    def test_module_walk_matches_reference_count(self):
        """The m{i} walk must produce the same number of parameterized
        modules as the reference all_modules list for the CIFAR config."""
        model = NCSNpp()
        shapes = shape_params(model, jnp.zeros((1, 32, 32, 3)),
                              jnp.zeros((1,)))
        names = {k for k in shapes["params"].keys() if k.startswith("m")}
        # Reference CIFAR-10 build: 2 temb Dense + 1 conv-in
        # + down: 4 levels x 8 blocks + attn at 16 (8 blocks) + 3 downsample res
        # + mid 3 + up: 4 x 9 blocks + 1 attn + 3 upsample res + GN + conv-out
        # = 2+1 + (32+8+3) + 3 + (36+1+3) + 2 = 91
        assert len(names) == 91, sorted(names, key=lambda s: int(s[1:]))

    def test_fir_variant_runs(self):
        model = NCSNpp(image_size=16, nf=16, ch_mult=(1, 2), num_res_blocks=1,
                       attn_resolutions=(8,), fir=True, num_scales=100)
        x = jnp.zeros((1, 16, 16, 3))
        t = jnp.array([10.0])
        params = model.init(jax.random.PRNGKey(0), x, t)
        out = model.apply(params, x, t)
        assert out.shape == (1, 16, 16, 3)

    def test_progressive_variants_run(self):
        for prog, prog_in in [("output_skip", "input_skip"),
                              ("residual", "residual")]:
            model = NCSNpp(image_size=16, nf=16, ch_mult=(1, 2),
                           num_res_blocks=1, attn_resolutions=(8,),
                           progressive=prog, progressive_input=prog_in,
                           progressive_combine="sum", fir=True,
                           num_scales=100)
            x = jnp.zeros((1, 16, 16, 3))
            t = jnp.array([10.0])
            params = model.init(jax.random.PRNGKey(0), x, t)
            out = model.apply(params, x, t)
            assert out.shape == (1, 16, 16, 3), prog


class TestADMUNet:
    @pytest.fixture(scope="class")
    def small_model(self):
        model = ADMUNet(image_size=32, model_channels=32, out_channels=6,
                        num_res_blocks=1, attention_resolutions=(4,),
                        channel_mult=(1, 2), num_head_channels=16)
        x = jnp.zeros((2, 32, 32, 3))
        t = jnp.array([100, 500])
        params = model.init(jax.random.PRNGKey(0), x, t)
        return model, params

    def test_forward_shape(self, small_model):
        model, params = small_model
        out = model.apply(params, jnp.ones((2, 32, 32, 3)) * 0.1,
                          jnp.array([100, 500]))
        assert out.shape == (2, 32, 32, 6)
        assert np.isfinite(np.asarray(out)).all()

    def test_imagenet256_param_count(self):
        """552M params (SURVEY.md §1.6)."""
        model = ADMUNet(**imagenet256_config(use_bf16=False))
        shapes = shape_params(model, jnp.zeros((1, 256, 256, 3)),
                              jnp.zeros((1,), jnp.int32))
        n = count_params(shapes)
        assert 540e6 < n < 565e6, n

    def test_bf16_torso_fp32_output(self):
        model = ADMUNet(image_size=32, model_channels=32, out_channels=6,
                        num_res_blocks=1, attention_resolutions=(4,),
                        channel_mult=(1, 2), num_head_channels=16,
                        dtype=jnp.bfloat16)
        x = jnp.ones((1, 32, 32, 3), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), x, jnp.array([100]))
        out = model.apply(params, x, jnp.array([100]))
        assert out.dtype == jnp.float32
        assert np.isfinite(np.asarray(out)).all()

    def test_zero_init_output_conv(self, small_model):
        """out.2 is zero-initialized => fresh model output is ~0
        (ref unet.py:620-624 zero_module)."""
        model, params = small_model
        out = model.apply(params, jnp.ones((1, 32, 32, 3)),
                          jnp.array([10]))
        np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


class TestDDPMUNet:
    def test_forward_shape(self):
        model = DDPMUNet(resolution=32, ch=32, ch_mult=(1, 2),
                         num_res_blocks=1, attn_resolutions=(16,))
        x = jnp.zeros((1, 32, 32, 3))
        t = jnp.array([100])
        params = model.init(jax.random.PRNGKey(0), x, t)
        out = model.apply(params, x, t)
        assert out.shape == (1, 32, 32, 3)

    def test_celebahq_param_count(self):
        """SDEdit CelebA-HQ DDPM UNet: ~113.7M params."""
        model = DDPMUNet()
        shapes = shape_params(model, jnp.zeros((1, 256, 256, 3)),
                              jnp.zeros((1,), jnp.int32))
        n = count_params(shapes)
        assert 100e6 < n < 130e6, n


def test_registry():
    m = create_model("ncsnpp", image_size=16, nf=16, ch_mult=(1, 2),
                     num_res_blocks=1)
    assert isinstance(m, NCSNpp)
    with pytest.raises(KeyError):
        create_model("nope")
