"""Numerics guards: NaN detection and value checks.

TPU equivalent of the reference's runtime assert discipline
(SURVEY.md §5.2 — the reference has shape asserts and CHECK_CUDA macros,
no sanitizers): jax debug_nans/checkify integration for CI, plus a
lightweight finite-check wrapper for eval pipelines.
"""
from __future__ import annotations

import contextlib
from typing import Callable

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def nan_guard(enable: bool = True):
    """Enable jax_debug_nans within a scope (CI switch)."""
    if not enable:
        yield
        return
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def checkified(fn: Callable, *, errors=None):
    """Wrap fn with checkify so in-jit checks become returned errors."""
    from jax.experimental import checkify
    if errors is None:
        errors = checkify.user_checks | checkify.nan_checks
    return checkify.checkify(fn, errors=errors)


def assert_finite(x: jax.Array, name: str = "tensor") -> jax.Array:
    """In-jit finite check (no-op unless checkify'd or debug_nans)."""
    from jax.experimental import checkify
    checkify.check(jnp.all(jnp.isfinite(x)), f"{name} contains non-finite "
                                             "values")
    return x


def assert_in_range(x: jax.Array, lo: float, hi: float,
                    name: str = "tensor") -> jax.Array:
    """Range contract (the reference's t-in-[0,1] style asserts,
    ref diffpure_sde.py:83)."""
    from jax.experimental import checkify
    checkify.check((jnp.min(x) >= lo) & (jnp.max(x) <= hi),
                   f"{name} out of range [{lo}, {hi}]")
    return x
