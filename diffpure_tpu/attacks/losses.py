"""Attack loss functions.

Faithful to the AutoAttack definitions (the torch-only `autoattack` package
the reference depends on; SURVEY.md §2.7) and mister_ed's CW-f6
(ref stadv_eot/recoloradv/mister_ed/loss_functions.py:214-244).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def ce_loss(logits: Array, y: Array) -> Array:
    """Per-example cross-entropy (to MAXIMIZE during attack)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, y[:, None], axis=-1)[:, 0]


def dlr_loss(logits: Array, y: Array) -> Array:
    """APGD-DLR: -(z_y - max_{i!=y} z_i) / (z_p1 - z_p3 + 1e-12)."""
    z_y = jnp.take_along_axis(logits, y[:, None], axis=-1)[:, 0]
    sorted_z = jnp.sort(logits, axis=-1)  # ascending
    z_p1 = sorted_z[:, -1]
    z_p2 = sorted_z[:, -2]
    z_p3 = sorted_z[:, -3]
    is_top = (z_p1 == z_y)
    zmax_other = jnp.where(is_top, z_p2, z_p1)
    return -(z_y - zmax_other) / (z_p1 - z_p3 + 1e-12)


def dlr_loss_targeted(logits: Array, y: Array, y_target: Array) -> Array:
    """Targeted DLR: -(z_y - z_t) / (z_p1 - (z_p3 + z_p4)/2 + 1e-12)."""
    z_y = jnp.take_along_axis(logits, y[:, None], axis=-1)[:, 0]
    z_t = jnp.take_along_axis(logits, y_target[:, None], axis=-1)[:, 0]
    sorted_z = jnp.sort(logits, axis=-1)
    denom = sorted_z[:, -1] - 0.5 * (sorted_z[:, -3] + sorted_z[:, -4]) + 1e-12
    return -(z_y - z_t) / denom


def margin_loss(logits: Array, y: Array) -> Array:
    """z_y - max_{i!=y} z_i (negative == misclassified). Square's objective."""
    z_y = jnp.take_along_axis(logits, y[:, None], axis=-1)[:, 0]
    masked = jnp.where(jax.nn.one_hot(y, logits.shape[-1], dtype=bool),
                       -jnp.inf, logits)
    return z_y - jnp.max(masked, axis=-1)


def cw_f6_loss(logits: Array, y: Array, kappa: float = 0.0) -> Array:
    """Carlini-Wagner f6 (to MAXIMIZE): max(z_other_max - z_y, -kappa) with
    the mister_ed sign convention (ref loss_functions.py:214-244)."""
    return jnp.maximum(-margin_loss(logits, y), -kappa)
