"""Discretization of adversarial examples to valid 8-bit images.

JAX rebuild of mister_ed/utils/discretize.py (224 LoC in the reference):
adversarial pixels live in continuous [0,1], but a deployed attack must
survive PNG quantization. Provides rounded/randomized discretizers and a
discretized-accuracy check.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

Array = jax.Array


def discretize_image(x01: Array, mode: str = "round",
                     key: Array | None = None) -> Array:
    """Map [0,1] floats to the 255-level grid.

    'round': nearest level; 'random': randomized rounding (unbiased).
    """
    scaled = x01 * 255.0
    if mode == "round":
        q = jnp.round(scaled)
    elif mode == "random":
        assert key is not None
        frac = scaled - jnp.floor(scaled)
        up = jax.random.uniform(key, x01.shape) < frac
        q = jnp.floor(scaled) + up.astype(scaled.dtype)
    else:
        raise ValueError(mode)
    return jnp.clip(q, 0.0, 255.0) / 255.0


def discretized_adversarial_check(model_fn: Callable, x_adv: Array,
                                  y: Array, key: Array,
                                  mode: str = "round") -> Array:
    """found-mask after 8-bit quantization: does the attack survive PNG?"""
    xq = discretize_image(x_adv, mode=mode, key=jax.random.fold_in(key, 1))
    logits = model_fn(xq, jax.random.fold_in(key, 2))
    return jnp.argmax(logits, -1) != y
