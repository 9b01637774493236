"""Conv strategy probe: conv_general_dilated vs 9-shifted-matmul 3x3 conv.

At 32x32 spatial with C=128/256 the MXU-friendly formulation of a 3x3 conv
is 9 (B*H*W, C) @ (C, C') matmuls over shifted views; if the conv primitive
underutilizes the MXU at these shapes, the explicit GEMM form wins.
"""
import time

import jax
import jax.numpy as jnp
from jax import lax


def conv_prim(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv_9mm(x, w):
    B, H, W, C = x.shape
    Cout = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = jnp.zeros((B * H * W, Cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            patch = xp[:, dy:dy + H, dx:dx + W, :].reshape(-1, C)
            out = out + jnp.dot(patch, w[dy, dx],
                                preferred_element_type=jnp.float32)
    return out.reshape(B, H, W, Cout).astype(x.dtype)


def bench(fn, x, w, label, n=20):
    @jax.jit
    def run(x, w):
        y = x
        for _ in range(10):  # chain to amortize
            y = fn(y, w) * 0.1
        return jnp.float32(y.sum())

    float(run(x, w))
    t0 = time.time()
    for _ in range(n):
        float(run(x, w))
    dt = (time.time() - t0) / n / 10
    flops = 2 * x.size * 9 * w.shape[-1]
    print(f"[{label}] {dt * 1e3:.3f} ms/conv  "
          f"{flops / dt / 1e12:.1f} TFLOP/s", flush=True)


def main():
    key = jax.random.PRNGKey(0)
    for (B, H, W, C) in [(128, 32, 32, 128), (128, 16, 16, 256),
                         (128, 8, 8, 256)]:
        x = jax.random.normal(key, (B, H, W, C), jnp.bfloat16) * 0.1
        w = jax.random.normal(key, (3, 3, C, C), jnp.bfloat16) * 0.05
        bench(conv_prim, x, w, f"prim {B}x{H}x{W}x{C}")
        bench(conv_9mm, x, w, f"9mm  {B}x{H}x{W}x{C}")


if __name__ == "__main__":
    main()
