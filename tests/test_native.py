"""Native C++ host ops vs the device (XLA) implementations."""
import numpy as np
import jax.numpy as jnp
import pytest

from diffpure_tpu.ops import upfirdn2d, fused_leaky_relu, setup_fir_kernel
from diffpure_tpu.ops.native import (
    native_available, upfirdn2d_native, fused_leaky_relu_native,
)

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="no C++ toolchain")


class TestNativeUpfirdn2d:
    @pytest.mark.parametrize("up,down,pad", [
        (1, 1, (1, 1)), (2, 1, (2, 1)), (1, 2, (1, 1)), (2, 2, (2, 2)),
    ])
    def test_matches_device_op(self, rng, up, down, pad):
        x = rng.randn(2, 8, 8, 3).astype(np.float32)
        k = setup_fir_kernel([1, 3, 3, 1])
        got = upfirdn2d_native(x, k, up=up, down=down, pad=pad)
        want = np.asarray(upfirdn2d(jnp.asarray(x), jnp.asarray(k),
                                    up=up, down=down, pad=pad))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_asymmetric_kernel(self, rng):
        x = rng.randn(1, 6, 6, 2).astype(np.float32)
        k = np.outer([1.0, 2.0, 4.0], [1.0, 0.5, 2.0]).astype(np.float32)
        got = upfirdn2d_native(x, k, pad=(1, 1))
        want = np.asarray(upfirdn2d(jnp.asarray(x), jnp.asarray(k),
                                    pad=(1, 1)))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


class TestNativeFusedAct:
    def test_matches_device_op(self, rng):
        x = rng.randn(2, 4, 4, 8).astype(np.float32)
        b = rng.randn(8).astype(np.float32)
        got = fused_leaky_relu_native(x, b)
        want = np.asarray(fused_leaky_relu(jnp.asarray(x), jnp.asarray(b)))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
