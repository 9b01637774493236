"""Kernel-level tests: ops vs independent numpy/torch oracles."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffpure_tpu.ops import (
    upfirdn2d, upsample_2d, downsample_2d, upsample_conv_2d,
    conv_downsample_2d, naive_upsample_2d, naive_downsample_2d,
    setup_fir_kernel, fused_leaky_relu, group_norm, group_norm_silu,
    spatial_attention, qkv_attention,
)


def upfirdn2d_oracle(x_nhwc, kernel, up=1, down=1, pad=(0, 0)):
    """Direct numpy implementation of the reference op semantics
    (zero-insert -> pad -> convolve with flipped kernel -> stride)."""
    N, H, W, C = x_nhwc.shape
    kh, kw = kernel.shape
    # 1. zero-insert upsample (zeros after each sample)
    up_h, up_w = H * up, W * up
    z = np.zeros((N, up_h, up_w, C), dtype=np.float64)
    z[:, ::up, ::up] = x_nhwc
    # 2. pad
    p0, p1 = pad
    z = np.pad(z, ((0, 0), (p0, p1), (p0, p1), (0, 0)))
    # 3. convolution (flip kernel) valid
    kf = kernel[::-1, ::-1]
    oh = z.shape[1] - kh + 1
    ow = z.shape[2] - kw + 1
    out = np.zeros((N, oh, ow, C))
    for i in range(kh):
        for j in range(kw):
            out += kf[i, j] * z[:, i:i + oh, j:j + ow, :]
    # 4. downsample
    return out[:, ::down, ::down]


class TestUpfirdn2d:
    @pytest.mark.parametrize("up,down,pad", [
        (1, 1, (1, 1)), (2, 1, (2, 1)), (1, 2, (1, 1)), (2, 2, (2, 2)),
        (1, 1, (0, 0)), (3, 1, (2, 2)),
    ])
    def test_matches_oracle(self, rng, up, down, pad):
        x = rng.randn(2, 8, 8, 3).astype(np.float32)
        k = setup_fir_kernel([1, 3, 3, 1])
        got = np.asarray(upfirdn2d(jnp.asarray(x), jnp.asarray(k),
                                   up=up, down=down, pad=pad))
        want = upfirdn2d_oracle(x, k, up=up, down=down, pad=pad)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_asymmetric_kernel_flip(self, rng):
        """A non-symmetric kernel exposes the convolution-vs-correlation flip."""
        x = rng.randn(1, 6, 6, 1).astype(np.float32)
        k = np.outer([1.0, 2.0, 4.0], [1.0, 2.0, 4.0]).astype(np.float32)
        got = np.asarray(upfirdn2d(jnp.asarray(x), jnp.asarray(k), pad=(1, 1)))
        want = upfirdn2d_oracle(x, k, pad=(1, 1))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_upsample_constant_gain(self):
        """Constant image upsampled with normalized kernel stays constant."""
        x = jnp.ones((1, 8, 8, 2))
        y = upsample_2d(x, [1, 3, 3, 1], factor=2)
        assert y.shape == (1, 16, 16, 2)
        np.testing.assert_allclose(np.asarray(y)[:, 4:-4, 4:-4], 1.0, rtol=1e-4)

    def test_downsample_constant(self):
        x = jnp.ones((1, 16, 16, 2))
        y = downsample_2d(x, [1, 3, 3, 1], factor=2)
        assert y.shape == (1, 8, 8, 2)
        np.testing.assert_allclose(np.asarray(y)[:, 2:-2, 2:-2], 1.0, rtol=1e-4)

    def test_naive_up_down(self, rng):
        x = rng.randn(2, 4, 4, 3).astype(np.float32)
        up = np.asarray(naive_upsample_2d(jnp.asarray(x)))
        assert up.shape == (2, 8, 8, 3)
        np.testing.assert_allclose(up[:, ::2, ::2], x)
        np.testing.assert_allclose(up[:, 1::2, 1::2], x)
        down = np.asarray(naive_downsample_2d(jnp.asarray(up)))
        np.testing.assert_allclose(down, x, rtol=1e-5)

    def test_upsample_conv_matches_torch_oracle(self, rng):
        """Fused upsample+conv vs a torch replication of the reference math
        (conv_transpose2d then FIR; up_or_down_sampling.py:80-149)."""
        import torch
        import torch.nn.functional as F
        x = rng.randn(1, 8, 8, 4).astype(np.float32)
        w = rng.randn(3, 3, 4, 6).astype(np.float32) * 0.1
        fused = np.asarray(upsample_conv_2d(jnp.asarray(x), jnp.asarray(w),
                                            k=[1, 3, 3, 1]))
        assert fused.shape == (1, 16, 16, 6)

        factor, kw = 2, 3
        kk = setup_fir_kernel([1, 3, 3, 1]) * (factor ** 2)
        p = (kk.shape[0] - factor) - (kw - 1)
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
        # torch conv_transpose weight (inC, outC, kh, kw), double-flipped as
        # in the reference: flip then the transpose conv flips again.
        wt = torch.from_numpy(w.transpose(3, 2, 0, 1))  # OIHW
        w2 = torch.flip(wt, [2, 3]).permute(1, 0, 2, 3)
        y = F.conv_transpose2d(xt, w2, stride=2, padding=0, output_padding=0)
        y = y.numpy().transpose(0, 2, 3, 1)
        want = upfirdn2d_oracle(y, kk, pad=((p + 1) // 2 + factor - 1, p // 2 + 1))
        np.testing.assert_allclose(fused, want, rtol=1e-3, atol=1e-4)

    def test_conv_downsample_matches_torch_oracle(self, rng):
        """Fused conv+downsample vs the reference composition
        (FIR then strided conv; up_or_down_sampling.py:152-186)."""
        import torch
        import torch.nn.functional as F
        x = rng.randn(1, 16, 16, 4).astype(np.float32)
        w = rng.randn(3, 3, 4, 6).astype(np.float32) * 0.1
        fused = np.asarray(conv_downsample_2d(jnp.asarray(x), jnp.asarray(w),
                                              k=[1, 3, 3, 1]))
        assert fused.shape == (1, 8, 8, 6)

        factor, kw = 2, 3
        kk = setup_fir_kernel([1, 3, 3, 1])
        p = (kk.shape[0] - factor) + (kw - 1)
        y = upfirdn2d_oracle(x, kk, pad=((p + 1) // 2, p // 2)).astype(np.float32)
        yt = torch.from_numpy(y.transpose(0, 3, 1, 2))
        wt = torch.from_numpy(w.transpose(3, 2, 0, 1))
        want = F.conv2d(yt, wt, stride=2).numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(fused, want, rtol=1e-3, atol=1e-4)


class TestFusedAct:
    def test_matches_torch_semantics(self, rng):
        import torch
        import torch.nn.functional as F
        x = rng.randn(2, 4, 4, 8).astype(np.float32)
        b = rng.randn(8).astype(np.float32)
        got = np.asarray(fused_leaky_relu(jnp.asarray(x), jnp.asarray(b)))
        xt = torch.from_numpy(x) + torch.from_numpy(b).view(1, 1, 1, -1)
        want = F.leaky_relu(xt, 0.2).numpy() * np.sqrt(2)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_pallas_kernel_matches(self, rng):
        from diffpure_tpu.ops.fused_act import fused_leaky_relu_pallas
        x = rng.randn(4, 8, 8, 16).astype(np.float32)
        b = rng.randn(16).astype(np.float32)
        got = np.asarray(fused_leaky_relu_pallas(jnp.asarray(x), jnp.asarray(b),
                                                 interpret=True))
        want = np.asarray(fused_leaky_relu(jnp.asarray(x), jnp.asarray(b)))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_gradient(self):
        g = jax.grad(lambda x: jnp.sum(fused_leaky_relu(x, jnp.zeros(1))))(
            jnp.array([[[[-1.0], [2.0]]]]))
        np.testing.assert_allclose(np.asarray(g).ravel(),
                                   [0.2 * np.sqrt(2), np.sqrt(2)], rtol=1e-5)


class TestGroupNorm:
    @pytest.mark.parametrize("C,groups", [(32, 8), (64, 32), (12, 3)])
    def test_matches_torch(self, rng, C, groups):
        import torch
        import torch.nn.functional as F
        x = rng.randn(2, 5, 5, C).astype(np.float32)
        scale = rng.randn(C).astype(np.float32)
        bias = rng.randn(C).astype(np.float32)
        got = np.asarray(group_norm(jnp.asarray(x), jnp.asarray(scale),
                                    jnp.asarray(bias), groups, eps=1e-6))
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
        want = F.group_norm(xt, groups, torch.from_numpy(scale),
                            torch.from_numpy(bias), eps=1e-6)
        want = want.numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_silu_fusion(self, rng):
        x = rng.randn(1, 4, 4, 8).astype(np.float32)
        s, b = np.ones(8, np.float32), np.zeros(8, np.float32)
        got = np.asarray(group_norm_silu(jnp.asarray(x), jnp.asarray(s),
                                         jnp.asarray(b), 4))
        h = np.asarray(group_norm(jnp.asarray(x), jnp.asarray(s),
                                  jnp.asarray(b), 4))
        np.testing.assert_allclose(got, h / (1 + np.exp(-h)), rtol=1e-5)


class TestAttention:
    def test_spatial_matches_torch_einsum(self, rng):
        """Replicates the NCSN++ bchw,bcij formulation (layerspp.py:82-86)."""
        import torch
        B, H, W, C = 2, 4, 4, 16
        q = rng.randn(B, H, W, C).astype(np.float32)
        k = rng.randn(B, H, W, C).astype(np.float32)
        v = rng.randn(B, H, W, C).astype(np.float32)
        got = np.asarray(spatial_attention(*map(jnp.asarray, (q, k, v))))

        qt = torch.from_numpy(q.transpose(0, 3, 1, 2))
        kt = torch.from_numpy(k.transpose(0, 3, 1, 2))
        vt = torch.from_numpy(v.transpose(0, 3, 1, 2))
        w = torch.einsum("bchw,bcij->bhwij", qt, kt) * (C ** -0.5)
        w = torch.softmax(w.reshape(B, H, W, H * W), dim=-1).reshape(B, H, W, H, W)
        out = torch.einsum("bhwij,bcij->bchw", w, vt)
        want = out.numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    @pytest.mark.parametrize("order", ["legacy", "new"])
    def test_qkv_matches_torch(self, rng, order):
        """Replicates QKVAttention(Legacy) (unet.py:336-397)."""
        import torch
        B, T, heads, ch = 2, 16, 4, 8
        width = 3 * heads * ch
        qkv = rng.randn(B, T, width).astype(np.float32)
        got = np.asarray(qkv_attention(jnp.asarray(qkv), heads, order=order))

        qkv_t = torch.from_numpy(qkv.transpose(0, 2, 1))  # (B, width, T)
        scale = 1 / (ch ** 0.25)
        if order == "legacy":
            q, k, v = qkv_t.reshape(B * heads, ch * 3, T).split(ch, dim=1)
        else:
            q, k, v = qkv_t.chunk(3, dim=1)
            q = q.reshape(B * heads, ch, T)
            k = k.reshape(B * heads, ch, T)
            v = v.reshape(B * heads, ch, T)
        w = torch.einsum("bct,bcs->bts", q * scale, k * scale)
        w = torch.softmax(w.float(), dim=-1).type(w.dtype)
        a = torch.einsum("bts,bcs->bct", w, v).reshape(B, -1, T)
        want = a.numpy().transpose(0, 2, 1)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_single_head_qkv_equals_spatial(self, rng):
        """Consistency between the two formulations at heads=1."""
        B, H, W, C = 1, 4, 4, 8
        q = rng.randn(B, H, W, C).astype(np.float32)
        k = rng.randn(B, H, W, C).astype(np.float32)
        v = rng.randn(B, H, W, C).astype(np.float32)
        s = np.asarray(spatial_attention(*map(jnp.asarray, (q, k, v))))
        qkv = np.concatenate([q, k, v], axis=-1).reshape(B, H * W, 3 * C)
        m = np.asarray(qkv_attention(jnp.asarray(qkv), 1, order="new"))
        np.testing.assert_allclose(s.reshape(B, H * W, C), m, rtol=1e-3,
                                   atol=1e-4)


class TestFusedGNSiLU:
    def test_pallas_matches_jnp(self, rng):
        from diffpure_tpu.ops.groupnorm import (
            group_norm_silu, group_norm_silu_pallas,
        )
        x = jnp.asarray(rng.randn(3, 8, 8, 128).astype(np.float32))
        s = jnp.asarray(rng.randn(128).astype(np.float32))
        b = jnp.asarray(rng.randn(128).astype(np.float32))
        want = np.asarray(group_norm_silu(x, s, b, 32))
        got = np.asarray(group_norm_silu_pallas(x, s, b, 32, interpret=True))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_gnsilu_module_matches_unfused(self, rng, key):
        import flax.linen as nn
        from diffpure_tpu.models.layers import GNSiLU, GroupNormTorch
        x = jnp.asarray(rng.randn(2, 4, 4, 32).astype(np.float32))
        m = GNSiLU(8)
        p = m.init(key, x)
        got = np.asarray(m.apply(p, x))
        gn = GroupNormTorch(8)
        want = np.asarray(nn.swish(gn.apply(p, x)))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
