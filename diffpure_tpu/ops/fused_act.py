"""Fused bias-add + leaky-ReLU + gain.

TPU counterpart of the reference's fused_bias_act CUDA kernel
(ref: score_sde/op/fused_bias_act_kernel.cu:18-99, python wrapper
fused_act.py:60-105). Exported for API parity with the reference op layer
(ref: score_sde/op/__init__.py:9); NCSN++ itself never calls it at runtime.

Two paths:
  - `fused_leaky_relu`: pure-jnp expression. Under jit XLA fuses the
    bias broadcast + select + scale into one VPU elementwise pass, which is
    already speed-of-light for an HBM-bound op. This is the default.
  - `fused_leaky_relu_pallas`: explicit Pallas kernel for the same math,
    exercised by tests as the "we can hand-roll it" path and available for
    fusion into larger Pallas pipelines.

Layout: NHWC; bias is per-channel (last axis). The reference's negative-slope
gradient semantics (2nd-order correct) fall out of JAX autodiff for free.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jax.Array

DEFAULT_SLOPE = 0.2
DEFAULT_SCALE = 2.0 ** 0.5  # ref fused_act.py:63 (sqrt(2) gain)


def fused_leaky_relu(x: Array, bias: Array | None = None,
                     negative_slope: float = DEFAULT_SLOPE,
                     scale: float = DEFAULT_SCALE) -> Array:
    """y = leaky_relu(x + bias) * scale (ref fused_act.py:94-105)."""
    if bias is not None:
        x = x + bias.reshape((1,) * (x.ndim - 1) + (-1,))
    return jnp.where(x >= 0, x, x * negative_slope) * scale


def _flr_kernel(x_ref, b_ref, o_ref, *, negative_slope, scale):
    x = x_ref[:]
    x = x + b_ref[:]
    o_ref[:] = jnp.where(x >= 0, x, x * negative_slope) * scale


def fused_leaky_relu_pallas(x: Array, bias: Array,
                            negative_slope: float = DEFAULT_SLOPE,
                            scale: float = DEFAULT_SCALE,
                            interpret: bool = False) -> Array:
    """Pallas elementwise kernel: bias broadcast + leaky-ReLU + gain.

    Operates on x reshaped to (rows, C) so the channel axis maps to lanes.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    orig_shape = x.shape
    C = x.shape[-1]
    x2 = x.reshape(-1, C)
    b2 = jnp.broadcast_to(bias.reshape(1, C), x2.shape)
    out = pl.pallas_call(
        functools.partial(_flr_kernel, negative_slope=negative_slope,
                          scale=scale),
        out_shape=jax.ShapeDtypeStruct(x2.shape, x2.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x2, b2)
    return out.reshape(orig_shape)
