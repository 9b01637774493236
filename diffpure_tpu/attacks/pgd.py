"""Projected gradient descent (madry-style) with EOT.

Generic building block: Linf/L2 steps, random init, signed or raw-gradient
updates, keep-best tracking. Used standalone and by the BPDA+EOT driver
(ref bpda_eot/bpda_eot_attack.py:86-96 pgd_update).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from diffpure_tpu.attacks.losses import ce_loss

Array = jax.Array
ModelFn = Callable[[Array, Array], Array]


@dataclasses.dataclass(frozen=True)
class PGDConfig:
    norm: str = "Linf"  # 'Linf' | 'L2'
    eps: float = 8 / 255
    step_size: float = 2 / 255
    n_iter: int = 50
    eot_iter: int = 1
    random_init: bool = False
    signed: bool = True


def _project(x0: Array, z: Array, eps: float, norm: str) -> Array:
    if norm == "Linf":
        z = jnp.clip(z, x0 - eps, x0 + eps)
    else:
        d = z - x0
        n = jnp.sqrt(jnp.sum(d.reshape(d.shape[0], -1) ** 2,
                             axis=-1)).reshape(-1, 1, 1, 1)
        z = x0 + d * jnp.minimum(1.0, eps / jnp.maximum(n, 1e-12))
    return jnp.clip(z, 0.0, 1.0)


def pgd_attack(model_fn: ModelFn, x: Array, y: Array, key: Array,
               cfg: PGDConfig, loss_fn=None) -> Tuple[Array, Array]:
    """Maximize loss_fn (default CE) within the eps-ball. Returns
    (x_adv, found_mask)."""
    if loss_fn is None:
        loss_fn = lambda logits: ce_loss(logits, y)
    B = x.shape[0]

    if cfg.random_init:
        k0, key = jax.random.split(key)
        if cfg.norm == "Linf":
            x_adv = x + cfg.eps * (2 * jax.random.uniform(k0, x.shape) - 1)
        else:
            d = jax.random.normal(k0, x.shape)
            dn = jnp.sqrt(jnp.sum(d.reshape(B, -1) ** 2,
                                  axis=-1)).reshape(-1, 1, 1, 1)
            r = jax.random.uniform(k0, (B, 1, 1, 1)) ** (1.0 / d[0].size)
            x_adv = x + cfg.eps * r * d / jnp.maximum(dn, 1e-12)
        x_adv = jnp.clip(x_adv, 0.0, 1.0)
    else:
        x_adv = x

    def grad_step(x_adv, k):
        def f(xx):
            return loss_fn(model_fn(xx, k)).sum()
        g = jax.grad(f)(x_adv)
        return g

    from diffpure_tpu.attacks.eot import eot_average

    def body(carry, i):
        x_adv, x_best, loss_best, found = carry
        k_i = jax.random.fold_in(key, i)
        g = eot_average(lambda k: grad_step(x_adv, k), k_i, cfg.eot_iter)

        if cfg.norm == "Linf":
            step = cfg.step_size * (jnp.sign(g) if cfg.signed else g)
        else:
            gn = jnp.sqrt(jnp.sum(g.reshape(B, -1) ** 2,
                                  axis=-1)).reshape(-1, 1, 1, 1)
            step = cfg.step_size * g / jnp.maximum(gn, 1e-12)
        x_adv = _project(x, x_adv + step, cfg.eps, cfg.norm)

        logits = model_fn(x_adv, jax.random.fold_in(k_i, 777))
        losses = loss_fn(logits)
        wrong = jnp.argmax(logits, -1) != y
        improved = losses > loss_best
        x_best = jnp.where((improved | wrong)[:, None, None, None], x_adv,
                           x_best)
        loss_best = jnp.maximum(losses, loss_best)
        found = found | wrong
        return (x_adv, x_best, loss_best, found), None

    init = (x_adv, x_adv, jnp.full((B,), -jnp.inf), jnp.zeros((B,), bool))
    (x_adv, x_best, _, found), _ = jax.lax.scan(body, init,
                                                jnp.arange(cfg.n_iter))
    return x_best, found
