"""Flash-attention Pallas kernel vs the jnp reference (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffpure_tpu.ops import qkv_attention
from diffpure_tpu.ops.flash_attention import (
    flash_attention, qkv_flash_attention,
)


class TestFlashAttention:
    @pytest.mark.parametrize("T,D", [(256, 64), (512, 128)])
    def test_matches_dense_softmax(self, rng, T, D):
        q = jnp.asarray(rng.randn(2, T, D).astype(np.float32)) * 0.3
        k = jnp.asarray(rng.randn(2, T, D).astype(np.float32)) * 0.3
        v = jnp.asarray(rng.randn(2, T, D).astype(np.float32))
        scale = 1.0 / (D ** 0.25)
        got = np.asarray(flash_attention(q, k, v, scale, block_q=128,
                                         block_k=128, interpret=True))
        s = jnp.einsum("btd,bsd->bts", q * scale, k * scale)
        want = jnp.einsum("bts,bsd->btd", jax.nn.softmax(s, -1), v)
        np.testing.assert_allclose(got, np.asarray(want), rtol=1e-4,
                                   atol=1e-5)

    @pytest.mark.parametrize("order", ["legacy", "new"])
    def test_qkv_matches_reference_op(self, rng, order):
        B, T, heads, ch = 2, 256, 4, 64
        qkv = jnp.asarray(rng.randn(B, T, 3 * heads * ch)
                          .astype(np.float32)) * 0.3
        got = np.asarray(qkv_flash_attention(qkv, heads, order=order,
                                             interpret=True))
        want = np.asarray(qkv_attention(qkv, heads, order=order))
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)

    def test_numerically_stable_large_logits(self, rng):
        """Online softmax must survive logits that overflow naive exp."""
        T, D = 128, 64
        q = jnp.asarray(rng.randn(1, T, D).astype(np.float32)) * 50
        k = jnp.asarray(rng.randn(1, T, D).astype(np.float32)) * 50
        v = jnp.asarray(rng.randn(1, T, D).astype(np.float32))
        out = np.asarray(flash_attention(q, k, v, 1.0, block_q=64,
                                         block_k=64, interpret=True))
        assert np.isfinite(out).all()

    def test_grad_matches_dense_softmax(self, rng):
        """custom VJP (recompute-exact backward) vs autodiff of the dense
        formula — the gradient the ImageNet-256 white-box protocol pays
        for (ref eval_sde_adv.py:103-110)."""
        T, D = 256, 64
        q = jnp.asarray(rng.randn(2, T, D).astype(np.float32)) * 0.3
        k = jnp.asarray(rng.randn(2, T, D).astype(np.float32)) * 0.3
        v = jnp.asarray(rng.randn(2, T, D).astype(np.float32))
        scale = 1.0 / (D ** 0.25)
        w = jnp.asarray(rng.randn(2, T, D).astype(np.float32))

        def flash_loss(q_, k_, v_):
            return jnp.sum(flash_attention(q_, k_, v_, scale, block_q=128,
                                           block_k=128, interpret=True) * w)

        def dense_loss(q_, k_, v_):
            s = jnp.einsum("btd,bsd->bts", q_ * scale, k_ * scale)
            a = jnp.einsum("bts,bsd->btd", jax.nn.softmax(s, -1), v_)
            return jnp.sum(a * w)

        got = jax.grad(flash_loss, argnums=(0, 1, 2))(q, k, v)
        want = jax.grad(dense_loss, argnums=(0, 1, 2))(q, k, v)
        for g, wgrad in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), np.asarray(wgrad),
                                       rtol=1e-4, atol=1e-5)

    def test_qkv_grad_flows(self, rng):
        """qkv-packed entry point (the ADM AttentionBlock path,
        adm_unet.py) is differentiable end-to-end."""
        B, T, heads, ch = 1, 128, 2, 64
        qkv = jnp.asarray(rng.randn(B, T, 3 * heads * ch)
                          .astype(np.float32)) * 0.3
        g = jax.grad(lambda a: jnp.sum(
            qkv_flash_attention(a, heads, interpret=True) ** 2))(qkv)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0

    def test_bf16_inputs(self, rng):
        T, D = 256, 64
        q = jnp.asarray(rng.randn(1, T, D).astype(np.float32) * 0.3,
                        jnp.bfloat16)
        k = jnp.asarray(rng.randn(1, T, D).astype(np.float32) * 0.3,
                        jnp.bfloat16)
        v = jnp.asarray(rng.randn(1, T, D).astype(np.float32),
                        jnp.bfloat16)
        out = flash_attention(q, k, v, 0.35, interpret=True)
        assert out.dtype == jnp.bfloat16
        s = jnp.einsum("btd,bsd->bts", q.astype(jnp.float32) * 0.35,
                       k.astype(jnp.float32) * 0.35)
        want = jnp.einsum("bts,bsd->btd", jax.nn.softmax(s, -1),
                          v.astype(jnp.float32))
        np.testing.assert_allclose(np.asarray(out, np.float32),
                                   np.asarray(want), rtol=0.05, atol=0.05)
