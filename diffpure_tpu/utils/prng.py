"""PRNG discipline: one root key, derived per-phase keys.

The defense is stochastic (SURVEY.md §7.4.4): every purifier call, EOT rep,
and attack iteration needs independent noise. All randomness descends from a
single root seed via fold_in chains — reproducible and jit-friendly, the
JAX analog of the reference's global seeding (ref eval_sde_adv.py:308-313).
"""
from __future__ import annotations

import random

import jax
import numpy as np


def seed_everything(seed: int) -> jax.Array:
    """Seed python/numpy RNGs (data subsetting) and return the root key."""
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


_PHASES = {}


def key_for(root: jax.Array, phase: str, index: int = 0) -> jax.Array:
    """Stable per-phase key: fold_in(root, hash(phase)) then index."""
    if phase not in _PHASES:
        _PHASES[phase] = len(_PHASES) + 101
    return jax.random.fold_in(jax.random.fold_in(root, _PHASES[phase]), index)
