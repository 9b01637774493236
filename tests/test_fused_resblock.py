"""Fused-resblock Pallas kernel: numerics, gradients, model integration.

The kernel (ops/fused_resblock.py) replaces the XLA chain of the BigGAN
residual block (ref score_sde/models/layerspp.py:212-271) on TPU; CPU tests
run it in Pallas interpret mode via set_fused_resblock(True).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffpure_tpu.ops.fused_resblock import (
    fused_resblock, fused_resblock_pallas, fused_resblock_reference,
)
from diffpure_tpu.models import layers as L


def make_inputs(rng, cin, cout, H=8, N=4, skip=True):
    x = jnp.asarray(rng.randn(N, H, H, cin).astype(np.float32) * 0.5)
    temb = jnp.asarray(rng.randn(N, cout).astype(np.float32) * 0.3)
    params = (
        jnp.asarray(1 + 0.1 * rng.randn(cin).astype(np.float32)),
        jnp.asarray(0.1 * rng.randn(cin).astype(np.float32)),
        jnp.asarray(rng.randn(3, 3, cin, cout).astype(np.float32) * 0.05),
        jnp.asarray(0.1 * rng.randn(cout).astype(np.float32)),
        jnp.asarray(1 + 0.1 * rng.randn(cout).astype(np.float32)),
        jnp.asarray(0.1 * rng.randn(cout).astype(np.float32)),
        jnp.asarray(rng.randn(3, 3, cout, cout).astype(np.float32) * 0.05),
        jnp.asarray(0.1 * rng.randn(cout).astype(np.float32)),
        jnp.asarray(rng.randn(cin, cout).astype(np.float32) * 0.1)
        if skip else None,
        jnp.asarray(0.1 * rng.randn(cout).astype(np.float32))
        if skip else None,
    )
    return x, temb, params


class TestKernelNumerics:
    @pytest.mark.parametrize("cin,cout,skip", [
        (128, 128, False), (128, 256, True), (256, 128, True),
    ])
    def test_matches_reference(self, rng, cin, cout, skip):
        x, temb, params = make_inputs(rng, cin, cout, skip=skip)
        g1, g2 = min(cin // 4, 32), min(cout // 4, 32)
        want = fused_resblock_reference(x, temb, params, num_groups1=g1,
                                        num_groups2=g2)
        got = fused_resblock_pallas(x, temb, params, num_groups1=g1,
                                    num_groups2=g2, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4)

    def test_im2col_conv_form_matches_reference(self, rng):
        """The perf-probe im2col conv form (one (M,9K)@(9K,N) matmul on the
        materialized window matrix) is numerically identical to the
        shipping 9-shifted-matmul form (scripts/perf_residual.py part 1)."""
        from diffpure_tpu.ops import fused_resblock as fr
        x, temb, params = make_inputs(rng, 128, 256, skip=True)
        want = fused_resblock_reference(x, temb, params, num_groups1=32,
                                        num_groups2=32)
        fr.set_conv_form("im2col")
        try:
            got = fused_resblock_pallas(x, temb, params, num_groups1=32,
                                        num_groups2=32, interpret=True)
        finally:
            fr.set_conv_form("mm9")
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4)

    def test_matches_unfused_block_math(self, rng):
        """Reference (fp32-accumulating) vs the plain jnp block chain."""
        cin = cout = 64
        x, temb, params = make_inputs(rng, cin, cout, skip=False)
        g = 16
        got = fused_resblock_reference(x, temb, params, num_groups1=g,
                                       num_groups2=g)
        from diffpure_tpu.ops.groupnorm import group_norm
        (s1, b1, w0, c0, s2, b2, w1, c1, _, _) = params
        h = group_norm(x, s1, b1, g)
        h = h * jax.nn.sigmoid(h)
        h = jax.lax.conv_general_dilated(
            h, w0, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + c0
        h = h + temb[:, None, None, :]
        h = group_norm(h, s2, b2, g)
        h = h * jax.nn.sigmoid(h)
        h = jax.lax.conv_general_dilated(
            h, w1, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + c1
        want = (x + h) * L.INV_SQRT2
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)

    def test_custom_vjp_matches_reference_grad(self, rng):
        x, temb, params = make_inputs(rng, 64, 64, skip=False)
        g = 16

        def f_fused(x, t, p):
            return fused_resblock(x, t, p, g, g, 1e-6, True, True).sum()

        def f_ref(x, t, p):
            return fused_resblock_reference(
                x, t, p, num_groups1=g, num_groups2=g).sum()

        gx_f, gt_f, gp_f = jax.grad(f_fused, argnums=(0, 1, 2))(
            x, temb, params)
        gx_r, gt_r, gp_r = jax.grad(f_ref, argnums=(0, 1, 2))(
            x, temb, params)
        # dx/dtemb come from the Pallas backward kernel: same math as the
        # reference vjp, fp32 summation order differs -> ~3e-6 noise
        np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r),
                                   atol=1e-5)
        # dtemb is a 64-term spatial reduction: fp32 order noise ~1e-5 rel
        np.testing.assert_allclose(np.asarray(gt_f), np.asarray(gt_r),
                                   rtol=1e-4, atol=5e-5)
        for a, b in zip(jax.tree_util.tree_leaves(gp_f),
                        jax.tree_util.tree_leaves(gp_r)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6)


class TestConcatVariant:
    """fused_resblock_cat: the UNet up-path concat happens in VMEM."""

    @pytest.mark.parametrize("c1,c2,cout", [(128, 128, 128),
                                            (256, 128, 256)])
    def test_matches_concat_reference(self, rng, c1, c2, cout):
        from diffpure_tpu.ops.fused_resblock import (
            fused_resblock_cat, fused_resblock_cat_pallas)
        cin = c1 + c2
        H, N = 8, 4
        x1 = jnp.asarray(rng.randn(N, H, H, c1).astype(np.float32) * 0.5)
        x2 = jnp.asarray(rng.randn(N, H, H, c2).astype(np.float32) * 0.5)
        temb = jnp.asarray(rng.randn(N, cout).astype(np.float32) * 0.3)
        params = tuple(jnp.asarray(a) for a in [
            1 + 0.1 * rng.randn(cin).astype(np.float32),
            0.1 * rng.randn(cin).astype(np.float32),
            rng.randn(3, 3, cin, cout).astype(np.float32) * 0.05,
            0.1 * rng.randn(cout).astype(np.float32),
            1 + 0.1 * rng.randn(cout).astype(np.float32),
            0.1 * rng.randn(cout).astype(np.float32),
            rng.randn(3, 3, cout, cout).astype(np.float32) * 0.05,
            0.1 * rng.randn(cout).astype(np.float32),
            rng.randn(cin, cout).astype(np.float32) * 0.1,
            0.1 * rng.randn(cout).astype(np.float32)])
        g1, g2 = min(cin // 4, 32), min(cout // 4, 32)
        want = fused_resblock_reference(
            jnp.concatenate([x1, x2], -1), temb, params,
            num_groups1=g1, num_groups2=g2)
        got = fused_resblock_cat_pallas(x1, x2, temb, params,
                                        num_groups1=g1, num_groups2=g2,
                                        interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4)

        def f_fused(x1, x2):
            return fused_resblock_cat(x1, x2, temb, params, g1, g2, 1e-6,
                                      True, True).sum()

        def f_ref(x1, x2):
            return fused_resblock_reference(
                jnp.concatenate([x1, x2], -1), temb, params,
                num_groups1=g1, num_groups2=g2).sum()

        g_f = jax.grad(f_fused, argnums=(0, 1))(x1, x2)
        g_r = jax.grad(f_ref, argnums=(0, 1))(x1, x2)
        # dx from the Pallas backward kernel: exact math, fp32 order noise
        for a, b in zip(g_f, g_r):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-5)


class TestResampleVariant:
    """In-kernel naive 2x up/down resampling (BigGAN up/down blocks)."""

    @pytest.mark.parametrize("resample", ["down", "up"])
    def test_matches_reference(self, rng, resample):
        cin = cout = 64
        x, temb, params = make_inputs(rng, cin, cout, H=8, skip=True)
        g = 16
        want = fused_resblock_reference(x, temb, params, num_groups1=g,
                                        num_groups2=g, resample=resample)
        got = fused_resblock_pallas(x, temb, params, num_groups1=g,
                                    num_groups2=g, resample=resample,
                                    interpret=True)
        assert got.shape == want.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4)

    def test_matches_unfused_block(self, rng):
        """Fused down-block vs the flax chain with shared params."""
        from diffpure_tpu.models import layers as L2
        import flax.linen as nn
        blk = L2.ResnetBlockBigGANpp(out_ch=64, down=True)
        x = jnp.asarray(rng.randn(4, 8, 8, 64).astype(np.float32) * 0.5)
        temb = jnp.asarray(rng.randn(4, 32).astype(np.float32) * 0.3)
        bp = blk.init(jax.random.PRNGKey(0), x, temb)
        want = blk.apply(bp, x, temb)
        L2.set_fused_resblock(True)
        try:
            got = blk.apply(bp, x, temb)
        finally:
            L2.set_fused_resblock("auto")
        assert got.shape == want.shape == (4, 4, 4, 64)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=5e-5)

    def test_grad_matches_reference(self, rng):
        x, temb, params = make_inputs(rng, 64, 64, H=8, skip=True)
        g = 16

        def f_fused(x):
            return fused_resblock(x, temb, params, g, g, 1e-6, True, True,
                                  "down").sum()

        def f_ref(x):
            return fused_resblock_reference(
                x, temb, params, num_groups1=g, num_groups2=g,
                resample="down").sum()

        gx_f = jax.grad(f_fused)(x)
        gx_r = jax.grad(f_ref)(x)
        np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r),
                                   atol=1e-6)


class TestBF16Gradients:
    def test_custom_vjp_works_in_bf16(self, rng):
        """Regression: the reference backward must be transposable when the
        torso runs bf16 (mixed-dtype preferred_element_type convs are not)."""
        x, temb, params = make_inputs(rng, 64, 64, skip=False)
        x = x.astype(jnp.bfloat16)
        g = 16

        def f(x):
            return fused_resblock(x, temb, params, g, g, 1e-6, True,
                                  True).astype(jnp.float32).sum()

        gx = jax.grad(f)(x)
        assert gx.dtype == jnp.bfloat16
        assert bool(jnp.isfinite(gx.astype(jnp.float32)).all())


class TestFusedAttnBlock:
    def _inputs(self, rng, C=128, H=8, N=4):
        x = jnp.asarray(rng.randn(N, H, H, C).astype(np.float32) * 0.5)
        params = tuple(jnp.asarray(a) for a in [
            1 + 0.1 * rng.randn(C).astype(np.float32),
            0.1 * rng.randn(C).astype(np.float32),
            rng.randn(C, C).astype(np.float32) * 0.1,
            0.1 * rng.randn(C).astype(np.float32),
            rng.randn(C, C).astype(np.float32) * 0.1,
            0.1 * rng.randn(C).astype(np.float32),
            rng.randn(C, C).astype(np.float32) * 0.1,
            0.1 * rng.randn(C).astype(np.float32),
            rng.randn(C, C).astype(np.float32) * 0.1,
            0.1 * rng.randn(C).astype(np.float32),
        ])
        return x, params

    def test_matches_reference(self, rng):
        from diffpure_tpu.ops.fused_attnblock import (
            fused_attnblock_pallas, fused_attnblock_reference)
        x, params = self._inputs(rng)
        want = fused_attnblock_reference(x, params, num_groups=32)
        got = fused_attnblock_pallas(x, params, num_groups=32,
                                     interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4)

    def test_matches_unfused_attnblock(self, rng):
        """Kernel vs the flax AttnBlockpp chain with shared params."""
        from diffpure_tpu.models.layers import AttnBlockpp
        from diffpure_tpu.ops.fused_attnblock import fused_attnblock_pallas
        C = 64
        x, params = self._inputs(rng, C=C)
        blk = AttnBlockpp(skip_rescale=True)
        bp = {"params": {
            "GroupNorm_0": {"scale": params[0], "bias": params[1]},
            "NIN_0": {"W": params[2], "b": params[3]},
            "NIN_1": {"W": params[4], "b": params[5]},
            "NIN_2": {"W": params[6], "b": params[7]},
            "NIN_3": {"W": params[8], "b": params[9]},
        }}
        want = blk.apply(bp, x)
        got = fused_attnblock_pallas(x, params, num_groups=16,
                                     interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-4)

    def test_grad_matches_reference(self, rng):
        from diffpure_tpu.ops.fused_attnblock import (
            fused_attnblock, fused_attnblock_reference)
        x, params = self._inputs(rng, C=64)

        def f_fused(x, p):
            return fused_attnblock(x, p, 16, 1e-6, True, True).sum()

        def f_ref(x, p):
            return fused_attnblock_reference(x, p, num_groups=16).sum()

        gx_f, gp_f = jax.grad(f_fused, argnums=(0, 1))(x, params)
        gx_r, gp_r = jax.grad(f_ref, argnums=(0, 1))(x, params)
        np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r),
                                   atol=1e-6)
        for a, b in zip(gp_f, gp_r):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6)


class TestModelIntegration:
    def _model_outputs(self, fused):
        from diffpure_tpu.models.ncsnpp import NCSNpp
        L.set_fused_resblock(fused)
        try:
            model = NCSNpp(image_size=16, nf=32, ch_mult=(1, 2),
                           num_res_blocks=2, attn_resolutions=(8,))
            key = jax.random.PRNGKey(0)
            params = model.init(key, jnp.zeros((1, 16, 16, 3)),
                                jnp.zeros((1,)))
            rng = np.random.RandomState(1)
            x = jnp.asarray(rng.randn(2, 16, 16, 3).astype(np.float32) * 0.5)
            t = jnp.asarray([99.9, 500.0], np.float32)
            return np.asarray(model.apply(params, x, t))
        finally:
            L.set_fused_resblock("auto")

    def test_full_model_fused_equals_unfused(self):
        """The fused path is a drop-in: same params, same outputs."""
        want = self._model_outputs(False)
        got = self._model_outputs(True)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=5e-5)

    def test_param_tree_unchanged(self):
        """Conv2dP/GroupNormP/DenseP keep the exact nn.Conv/Dense names."""
        from diffpure_tpu.models.ncsnpp import NCSNpp
        model = NCSNpp(image_size=16, nf=32, ch_mult=(1, 2),
                       num_res_blocks=1, attn_resolutions=(8,))
        shapes = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 16, 16, 3)), jnp.zeros((1,))))
        # m4 is the first BigGAN resblock (m0-m1 temb denses, m3 conv_in)
        names = {k for k in shapes["params"] if k.startswith("m")}
        block_keys = None
        for k in sorted(names):
            sub = shapes["params"][k]
            if "GroupNorm_0" in sub and "Conv_0" in sub:
                block_keys = set(sub.keys())
                break
        assert block_keys is not None
        assert {"GroupNorm_0", "Conv_0", "Dense_0", "GroupNorm_1",
                "Conv_1"} <= block_keys


class TestVmemTilePickers:
    """Pin the scoped-vmem fit decisions that gate Pallas vs fallback.

    The fp32 no-fit cases reproduce the flagship-scale training OOM
    (compiler charged 18.8 MB > 16 MB cap for the widest CIFAR concat
    block's backward at fp32); the bf16 cases pin the measured round-3
    serving behavior so a picker change that silently de-fuses the attack
    path fails here first.
    """

    def test_bf16_cifar_blocks_keep_pallas_bwd(self):
        from diffpure_tpu.ops.fused_resblock import _pick_batch_tile_bwd
        # plain 128->128 and the widest concat block (256+128 -> 128)
        assert _pick_batch_tile_bwd(128, 32, 32, 128, 128, esize=2) == 1
        assert _pick_batch_tile_bwd(128, 32, 32, 384, 128, esize=2) == 1

    def test_fp32_wide_concat_bwd_falls_back(self):
        from diffpure_tpu.ops.fused_resblock import _pick_batch_tile_bwd
        assert _pick_batch_tile_bwd(128, 32, 32, 384, 128, esize=4) is None

    def test_forward_picker_fp32_and_bf16(self):
        from diffpure_tpu.ops.fused_resblock import _pick_batch_tile
        # round-2 measured optimum at 32x32x128 bf16
        assert _pick_batch_tile(128, 32, 32, 128, 128, esize=2) == 2
        # fp32 wide concat forward still fits at bt=1 (est 15.3 MB < cap;
        # the cat kernel normalizes into the pad scratch, saving one
        # cin-wide fp32 map vs the plain kernel)
        assert _pick_batch_tile(128, 32, 32, 384, 128, esize=4,
                                cat=True) == 1

    def test_bf16_serving_tile_choices_pinned(self):
        """Every distinct resblock shape in the flagship CIFAR NCSN++
        (nf=128, ch_mult=(1,2,2,2), 8 blocks) at the b128 bf16 serving
        batch — the driver-benched path. A picker change that alters any
        of these re-times the headline; this test makes that loud."""
        from diffpure_tpu.ops.fused_resblock import _pick_batch_tile
        expected = {
            # (H, cin, cout, has_skip, cat): bt
            (32, 128, 128, False, False): 2,
            (32, 128, 256, True, False): 1,
            (16, 128, 256, True, False): 4,
            (16, 256, 256, False, False): 4,
            (8, 256, 256, False, False): 8,
            (4, 256, 256, False, False): 8,
            (4, 512, 256, True, True): 8,
            (8, 512, 256, True, True): 8,
            (8, 384, 256, True, True): 8,
            (16, 512, 256, True, True): 2,
            (16, 384, 256, True, True): 2,
            (32, 384, 128, True, True): 1,
            (32, 256, 128, True, True): 2,
        }
        for (h, ci, co, sk, cat), want in expected.items():
            got = _pick_batch_tile(128, h, h, ci, co, esize=2,
                                   has_skip=sk, cat=cat)
            assert got == want, (h, ci, co, sk, cat, got, want)

    def test_forward_picker_fp32_oom_shape_steps_down(self):
        """The flagship fp32 demo OOM: 16x16 128->256 at bt=4 was charged
        17.83 MB by Mosaic (> 16 MB cap). The calibrated model estimates
        17.7 MB at bt=4 and must step down to bt=2 (est 12.5 MB)."""
        from diffpure_tpu.ops.fused_resblock import _pick_batch_tile
        bt = _pick_batch_tile(32, 16, 16, 128, 256, esize=4)
        assert bt is not None and bt <= 2

    def test_custom_vjp_fallback_grad_matches(self, rng):
        """When the bwd kernel doesn't fit, the custom_vjp must still
        produce the reference gradient (full XLA autodiff path)."""
        from diffpure_tpu.ops import fused_resblock as FR
        x, temb, params = make_inputs(rng, 128, 128, H=8, N=2)
        g1 = g2 = 32

        def loss_fused(x_, t_, p_):
            return jnp.sum(FR.fused_resblock(x_, t_, p_, g1, g2, 1e-6,
                                             True, True) ** 2)

        def loss_ref(x_, t_, p_):
            return jnp.sum(FR.fused_resblock_reference(
                x_, t_, p_, num_groups1=g1, num_groups2=g2) ** 2)

        orig = FR._pick_batch_tile_bwd
        FR._pick_batch_tile_bwd = lambda *a, **k: None  # force fallback
        try:
            gx, gt, gp = jax.grad(loss_fused, argnums=(0, 1, 2))(
                x, temb, params)
        finally:
            FR._pick_batch_tile_bwd = orig
        wx, wt, wp = jax.grad(loss_ref, argnums=(0, 1, 2))(x, temb, params)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(wx),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(gt), np.asarray(wt),
                                   rtol=2e-4, atol=2e-4)
        for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(wp)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-4)
