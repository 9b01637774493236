"""Mixed-precision policies.

TPU counterpart of guided_diffusion/fp16_util.py: on TPU the fp16
master-param + dynamic-loss-scaling machinery (ref fp16_util.py:156-243)
collapses to a bf16 compute policy — bf16 shares float32's exponent range,
so no scaling is needed. A loss scaler is still provided for completeness
(fp16 experiments / parity studies).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    """Param/compute/output dtypes (the convert_to_fp16 analog,
    ref unet.py:626-640)."""
    param_dtype: Any = jnp.float32
    compute_dtype: Any = jnp.float32
    output_dtype: Any = jnp.float32

    def cast_to_compute(self, tree):
        return jax.tree_util.tree_map(
            lambda x: x.astype(self.compute_dtype), tree)

    def cast_to_param(self, tree):
        return jax.tree_util.tree_map(
            lambda x: x.astype(self.param_dtype), tree)

    def cast_output(self, x):
        return x.astype(self.output_dtype)


def bf16_policy() -> Policy:
    """The TPU default torso policy: fp32 params, bf16 compute, fp32 out."""
    return Policy(param_dtype=jnp.float32, compute_dtype=jnp.bfloat16,
                  output_dtype=jnp.float32)


def fp32_policy() -> Policy:
    return Policy()


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DynamicLossScaler:
    """Dynamic loss scaling state (ref fp16_util.py:156-243).

    Not needed for bf16; provided for fp16 parity experiments: scale the
    loss up, check grads finite, grow/shrink the scale.
    """
    log_scale: jax.Array
    growth: float = dataclasses.field(default=1e-3,
                                      metadata=dict(static=True))
    backoff: float = dataclasses.field(default=1.0,
                                       metadata=dict(static=True))

    @staticmethod
    def create(initial_log_scale: float = 20.0) -> "DynamicLossScaler":
        return DynamicLossScaler(log_scale=jnp.asarray(initial_log_scale))

    @property
    def scale(self) -> jax.Array:
        return 2.0 ** self.log_scale

    def scale_loss(self, loss):
        return loss * self.scale

    def unscale_grads(self, grads):
        inv = 1.0 / self.scale
        return jax.tree_util.tree_map(lambda g: g * inv, grads)

    def update(self, grads_finite: jax.Array) -> "DynamicLossScaler":
        """grow on success, back off on overflow (ref fp16_util.py:217-230)."""
        new_log = jnp.where(grads_finite, self.log_scale + self.growth,
                            self.log_scale - self.backoff)
        return dataclasses.replace(self, log_scale=new_log)


def grads_finite(grads) -> jax.Array:
    leaves = jax.tree_util.tree_leaves(grads)
    finite = jnp.array(True)
    for leaf in leaves:
        finite = finite & jnp.all(jnp.isfinite(leaf))
    return finite
