"""Generic attacks over parameterized perturbations (mister_ed surface).

JAX rebuild of mister_ed/adversarial_attacks.py: the PGD driver over an
arbitrary Perturbation (ref :240-404 — Adam or signed updates, EOT grad
averaging, per-example keep-best), FGSM (ref :170-236), and Carlini-Wagner
(ref :425+). Losses follow loss_functions.py: CW-f6 + weighted perturbation
norm with the negate convention (RegularizedLoss, ref :33-100).

The StAdv production path has a specialized implementation
(attacks/stadv.py); this module is the general framework the reference
vendors, usable with DeltaAddition / spatial / sequential perturbations.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from diffpure_tpu.attacks.losses import ce_loss, margin_loss
from diffpure_tpu.attacks.perturbations import Perturbation

Array = jax.Array
ModelFn = Callable[[Array, Array], Array]


def cw_f6(logits: Array, y: Array, kappa: float = float("inf"),
          targeted: bool = False) -> Array:
    """minimize-type CW f6 (ref loss_functions.py:214-244)."""
    m = margin_loss(logits, y)
    out = -m if targeted else m
    if kappa != float("inf"):
        out = jnp.maximum(out, -kappa)
    return out


@dataclasses.dataclass(frozen=True)
class MisterEdPGDConfig:
    num_iterations: int = 20
    step_size: float = 1.0 / 255.0
    signed: bool = True
    optimizer_lr: Optional[float] = None  # set -> Adam, unsigned
    eot_iter: int = 1
    keep_best: bool = True
    random_init: bool = False
    perturbation_norm_weight: float = 0.0
    kappa: float = float("inf")


def perturbation_pgd(model_fn: ModelFn, perturbation: Perturbation,
                     x: Array, y: Array, key: Array,
                     cfg: MisterEdPGDConfig) -> Tuple[Array, Array]:
    """PGD over perturbation params; returns (x_adv, found).

    Objective (minimized): cw_f6 + weight * perturbation.norm
    (RegularizedLoss with negate, folded; ref PGD.attack:341-382).
    """
    params = perturbation.init_params(x)
    if cfg.random_init:
        params = perturbation.random_init(jax.random.fold_in(key, 999),
                                          params, x)

    use_adam = cfg.optimizer_lr is not None
    opt = optax.adam(cfg.optimizer_lr) if use_adam else None
    opt_state = opt.init(params) if use_adam else None

    def objective(params, k):
        p = perturbation.project(params, x)
        x_t = perturbation.apply(p, x)
        logits = model_fn(x_t, k)
        per_ex = cw_f6(logits, y, cfg.kappa)
        if cfg.perturbation_norm_weight:
            per_ex = per_ex + (cfg.perturbation_norm_weight
                               * perturbation.norm(p, x))
        return per_ex.sum(), per_ex

    from diffpure_tpu.attacks.eot import eot_average

    def body(carry, i):
        params, opt_state, best_params, best_score = carry
        k_i = jax.random.fold_in(key, i)

        def single(k):
            (_, pe), g = jax.value_and_grad(objective, has_aux=True)(params,
                                                                     k)
            return g, pe

        g, per_ex = eot_average(single, k_i, cfg.eot_iter)

        if use_adam:
            updates, opt_state = opt.update(g, opt_state, params)
            params = optax.apply_updates(params, updates)
        else:
            params = jax.tree_util.tree_map(
                lambda p, gg: p - cfg.step_size * jnp.sign(gg), params, g)

        if cfg.keep_best:
            improved = per_ex < best_score
            best_params = perturbation.merge(
                jax.tree_util.tree_map(lambda a: a, params), best_params,
                improved)
            best_score = jnp.minimum(per_ex, best_score)
        else:
            best_params, best_score = params, per_ex
        return (params, opt_state, best_params, best_score), None

    init = (params, opt_state, params,
            jnp.full((x.shape[0],), jnp.inf))
    (params, _, best_params, _), _ = jax.lax.scan(
        body, init, jnp.arange(cfg.num_iterations))

    final = perturbation.project(best_params, x)
    x_adv = perturbation.apply(final, x)
    logits = model_fn(x_adv, jax.random.fold_in(key, 123_321))
    found = jnp.argmax(logits, -1) != y
    return x_adv, found


def fgsm(model_fn: ModelFn, x: Array, y: Array, key: Array,
         eps: float = 8 / 255) -> Array:
    """One signed CE step (ref adversarial_attacks.py:170-236)."""
    g = jax.grad(lambda xx: ce_loss(model_fn(xx, key), y).sum())(x)
    return jnp.clip(x + eps * jnp.sign(g), 0.0, 1.0)


@dataclasses.dataclass(frozen=True)
class CarliniWagnerConfig:
    num_iterations: int = 100
    lr: float = 1e-2
    initial_const: float = 1e-1
    kappa: float = 0.0


def carlini_wagner(model_fn: ModelFn, x: Array, y: Array, key: Array,
                   cfg: CarliniWagnerConfig) -> Tuple[Array, Array]:
    """L2 CW attack in tanh space (ref adversarial_attacks.py:425+):
    minimize ||x'-x||^2 + c * f6(x'). Returns (x_adv, found)."""
    x_c = jnp.clip(x, 1e-6, 1 - 1e-6)
    w0 = jnp.arctanh(2 * x_c - 1)

    opt = optax.adam(cfg.lr)
    opt_state = opt.init(w0)

    def objective(w, k):
        x_t = (jnp.tanh(w) + 1) / 2
        dist = jnp.sum((x_t - x).reshape(x.shape[0], -1) ** 2, -1)
        f6 = jnp.maximum(margin_loss(model_fn(x_t, k), y), -cfg.kappa)
        per_ex = dist + cfg.initial_const * f6
        return per_ex.sum(), (per_ex, dist)

    def body(carry, i):
        w, opt_state, best_x, best_dist, found = carry
        k_i = jax.random.fold_in(key, i)
        (_, (per_ex, dist)), g = jax.value_and_grad(
            objective, has_aux=True)(w, k_i)
        updates, opt_state = opt.update(g, opt_state, w)
        w = optax.apply_updates(w, updates)
        x_t = (jnp.tanh(w) + 1) / 2
        wrong = jnp.argmax(model_fn(x_t, jax.random.fold_in(k_i, 3)),
                           -1) != y
        improved = wrong & (dist < best_dist)
        best_x = jnp.where(improved[:, None, None, None], x_t, best_x)
        best_dist = jnp.where(improved, dist, best_dist)
        found = found | wrong
        return (w, opt_state, best_x, best_dist, found), None

    init = (w0, opt_state, x, jnp.full((x.shape[0],), jnp.inf),
            jnp.zeros((x.shape[0],), bool))
    (_, _, best_x, _, found), _ = jax.lax.scan(
        body, init, jnp.arange(cfg.num_iterations))
    return best_x, found


@dataclasses.dataclass
class AdversarialAttackParameters:
    """Attack orchestration wrapper (ref mister_ed/adversarial_training.py:35):
    binds an attack callable + the proportion of each batch to attack."""

    attack_fn: Callable
    proportion_attacked: float = 1.0

    def attack(self, x: Array, y: Array, key: Array):
        """Attack a random proportion of the batch; returns
        (x_out, y, adv_mask) like the reference's (adv_examples, ...)."""
        B = x.shape[0]
        n_attack = max(int(round(self.proportion_attacked * B)), 0)
        perm = jax.random.permutation(jax.random.fold_in(key, 0), B)
        chosen = perm[:n_attack]
        mask = jnp.zeros((B,), bool).at[chosen].set(True)
        x_adv, _ = self.attack_fn(x, y, jax.random.fold_in(key, 1))
        x_out = jnp.where(mask[:, None, None, None], x_adv, x)
        return x_out, y, mask
