"""Normalization zoo for the NCSN family (NHWC flax).

JAX rebuild of score_sde/models/normalization.py:22-215: conditional and
unconditional variants of batch/instance/variance/none normalization plus
the NCSNv2 default InstanceNorm2dPlus. Conditional variants embed the noise
level index (num_classes scales).
"""
from __future__ import annotations

import functools
from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


def get_normalization(normalization: str, conditional: bool = False,
                      num_classes: int = 0) -> Callable:
    """ref normalization.py:22-40."""
    norm = normalization
    if conditional:
        if norm == "InstanceNorm++":
            return functools.partial(ConditionalInstanceNorm2dPlus,
                                     num_classes=num_classes)
        raise NotImplementedError(f"{norm} not implemented conditionally")
    if norm == "InstanceNorm":
        return InstanceNorm2d
    if norm == "InstanceNorm++":
        return InstanceNorm2dPlus
    if norm == "VarianceNorm":
        return VarianceNorm2d
    if norm == "GroupNorm":
        from diffpure_tpu.models.layers import GroupNormTorch
        return functools.partial(GroupNormTorch, num_groups=32, eps=1e-5)
    raise ValueError(f"unknown normalization: {norm}")


def _instance_norm(x: Array, eps: float = 1e-5) -> Array:
    """Per-(example, channel) spatial normalization, no affine."""
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


class InstanceNorm2d(nn.Module):
    """torch nn.InstanceNorm2d(affine=True) equivalent."""
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: Array) -> Array:
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        return _instance_norm(x, self.eps) * scale + bias


class VarianceNorm2d(nn.Module):
    """ref normalization.py:110-123: scale-only variance normalization."""
    bias: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        C = x.shape[-1]
        alpha = self.param("alpha",
                           lambda k, s: 1 + 0.02 * jax.random.normal(k, s),
                           (C,))
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        h = x * jax.lax.rsqrt(var + 1e-5)
        return alpha * h


class NoneNorm2d(nn.Module):
    """ref normalization.py:149-154."""

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return x


class InstanceNorm2dPlus(nn.Module):
    """ref normalization.py:157-183: instance norm + cross-channel mean
    re-injection (fixes the information-loss of plain IN)."""
    bias: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        C = x.shape[-1]
        init = lambda k, s: 1 + 0.02 * jax.random.normal(k, s)
        alpha = self.param("alpha", init, (C,))
        gamma = self.param("gamma", init, (C,))
        means = jnp.mean(x, axis=(1, 2))  # (N, C)
        m = jnp.mean(means, axis=-1, keepdims=True)
        # torch.var default is unbiased (ddof=1)
        v = jnp.var(means, axis=-1, keepdims=True, ddof=1)
        means = (means - m) * jax.lax.rsqrt(v + 1e-5)
        h = _instance_norm(x)
        h = h + means[:, None, None, :] * alpha
        out = gamma * h
        if self.bias:
            beta = self.param("beta", nn.initializers.zeros, (C,))
            out = out + beta
        return out


class _CondEmbed(nn.Module):
    """Class-conditional (gamma[, alpha][, beta]) lookup."""
    num_classes: int
    n_chunks: int
    features: int
    zero_last: bool = True

    @nn.compact
    def __call__(self, y: Array) -> Array:
        def init(k, s):
            w = 1 + 0.02 * jax.random.normal(k, s)
            if self.zero_last and self.n_chunks > 1:
                w = w.at[:, (self.n_chunks - 1) * self.features:].set(0.0)
            return w

        emb = self.param("embedding", init,
                         (self.num_classes, self.n_chunks * self.features))
        return emb[y]


class ConditionalInstanceNorm2dPlus(nn.Module):
    """ref normalization.py:186-215."""
    num_classes: int = 10
    bias: bool = True

    @nn.compact
    def __call__(self, x: Array, y: Array) -> Array:
        C = x.shape[-1]
        n_chunks = 3 if self.bias else 2
        emb = _CondEmbed(self.num_classes, n_chunks, C,
                         zero_last=self.bias, name="embed")(y)
        means = jnp.mean(x, axis=(1, 2))
        m = jnp.mean(means, axis=-1, keepdims=True)
        v = jnp.var(means, axis=-1, keepdims=True, ddof=1)  # torch unbiased
        means = (means - m) * jax.lax.rsqrt(v + 1e-5)
        h = _instance_norm(x)
        if self.bias:
            gamma, alpha, beta = jnp.split(emb, 3, axis=-1)
        else:
            gamma, alpha = jnp.split(emb, 2, axis=-1)
            beta = 0.0
        h = h + means[:, None, None, :] * alpha[:, None, None, :]
        return gamma[:, None, None, :] * h + (
            beta[:, None, None, :] if self.bias else 0.0)


class ConditionalVarianceNorm2d(nn.Module):
    """ref normalization.py:93-107."""
    num_classes: int = 10

    @nn.compact
    def __call__(self, x: Array, y: Array) -> Array:
        C = x.shape[-1]
        emb = _CondEmbed(self.num_classes, 1, C, zero_last=False,
                         name="embed")(y)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        h = x * jax.lax.rsqrt(var + 1e-5)
        return emb[:, None, None, :] * h


class ConditionalNoneNorm2d(nn.Module):
    """ref normalization.py:126-146."""
    num_classes: int = 10
    bias: bool = True

    @nn.compact
    def __call__(self, x: Array, y: Array) -> Array:
        C = x.shape[-1]
        n_chunks = 2 if self.bias else 1
        emb = _CondEmbed(self.num_classes, n_chunks, C,
                         zero_last=self.bias, name="embed")(y)
        if self.bias:
            gamma, beta = jnp.split(emb, 2, axis=-1)
            return gamma[:, None, None, :] * x + beta[:, None, None, :]
        return emb[:, None, None, :] * x
