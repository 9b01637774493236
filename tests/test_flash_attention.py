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
