"""FAB-T: targeted Fast Adaptive Boundary attack (Croce & Hein, 2020).

Minimum-norm attack in AutoAttack's 'standard' suite (9 target classes,
100 iterations). Per iteration the decision boundary between the true and
target class is linearized and the iterate takes a combined projection step
toward it (overshoot alpha/eta), with a backward step (beta) toward the
original point on success; the best (smallest-norm) adversarial is kept.

Clean-room note: the box-constrained hyperplane projections
min ||d||_p s.t. w.(x+d)=b, 0<=x+d<=1 are solved here by exact bisection on
the Lagrange multiplier (monotone in the dual variable) instead of
AutoAttack's sort-and-scan — same optimum, simpler to vectorize on TPU.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array
ModelFn = Callable[[Array, Array], Array]


@dataclasses.dataclass(frozen=True)
class FABConfig:
    norm: str = "Linf"
    eps: float = 8 / 255
    n_iter: int = 100
    n_target_classes: int = 9
    n_restarts: int = 1
    alpha_max: float = 0.1
    eta: float = 1.05
    beta: float = 0.9
    seed: int = 0
    # bound single-dispatch length when model_fn is an expensive defended
    # forward (execution-watchdog backends; utils/jitlift.scan_chunked)
    iters_per_dispatch: int = 0


def _flat(v):
    return v.reshape(v.shape[0], -1)


def _proj_hyperplane_box_linf(x: Array, w: Array, b: Array,
                              n_bisect: int = 30) -> Array:
    """min ||z - x||_inf s.t. w.z = b, 0 <= z <= 1, by bisection on t.

    For radius t, the reachable interval of w.z over the box-intersected
    Linf-ball is monotone in t; find the smallest t whose interval covers b,
    then take the boundary solution.
    """
    xf, wf = _flat(x), _flat(w)

    def reach(t):
        t = t[:, None]
        lo = jnp.clip(xf - t, 0.0, 1.0)
        hi = jnp.clip(xf + t, 0.0, 1.0)
        mx = jnp.sum(jnp.where(wf >= 0, wf * hi, wf * lo), axis=-1)
        mn = jnp.sum(jnp.where(wf >= 0, wf * lo, wf * hi), axis=-1)
        return mn, mx

    t_lo = jnp.zeros(x.shape[0])
    t_hi = jnp.ones(x.shape[0])

    def bisect(_, carry):
        t_lo, t_hi = carry
        t_mid = 0.5 * (t_lo + t_hi)
        mn, mx = reach(t_mid)
        ok = (mn <= b) & (b <= mx)
        return jnp.where(ok, t_lo, t_mid), jnp.where(ok, t_mid, t_hi)

    t_lo, t_hi = jax.lax.fori_loop(0, n_bisect, bisect, (t_lo, t_hi))
    t = t_hi[:, None]

    # boundary solution at radius t: push coords in sign(w)*s direction as
    # needed; s chosen so that w.z = b where possible. With z(mu) =
    # clip(x - mu*sign-ish, box) parameterized by a scalar mu in [-1,1]
    # interpolating between the min- and max- attaining corners.
    lo = jnp.clip(xf - t, 0.0, 1.0)
    hi = jnp.clip(xf + t, 0.0, 1.0)
    z_max = jnp.where(wf >= 0, hi, lo)
    z_min = jnp.where(wf >= 0, lo, hi)

    def mu_bisect(_, carry):
        m_lo, m_hi = carry
        m = 0.5 * (m_lo + m_hi)
        z = z_min + m[:, None] * (z_max - z_min)
        val = jnp.sum(wf * z, axis=-1)
        go_up = val < b
        return jnp.where(go_up, m, m_lo), jnp.where(go_up, m_hi, m)

    m_lo, m_hi = jax.lax.fori_loop(
        0, n_bisect, mu_bisect,
        (jnp.zeros(x.shape[0]), jnp.ones(x.shape[0])))
    z = z_min + 0.5 * (m_lo + m_hi)[:, None] * (z_max - z_min)
    return z.reshape(x.shape)


def _proj_hyperplane_box_l2(x: Array, w: Array, b: Array,
                            n_bisect: int = 40) -> Array:
    """min ||z - x||_2 s.t. w.z = b, 0 <= z <= 1: z = clip(x - mu w, 0, 1),
    with mu found by bisection (w.z(mu) is monotone decreasing in mu)."""
    xf, wf = _flat(x), _flat(w)
    wnorm = jnp.sqrt(jnp.sum(wf ** 2, axis=-1, keepdims=True)) + 1e-12
    span = 2.0 / wnorm[:, 0] * jnp.sqrt(jnp.asarray(float(xf.shape[-1])))
    mu_lo, mu_hi = -span, span

    def bisect(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        z = jnp.clip(xf - mid[:, None] * wf, 0.0, 1.0)
        val = jnp.sum(wf * z, axis=-1)
        gt = val > b  # need larger mu to decrease val
        return jnp.where(gt, mid, lo), jnp.where(gt, hi, mid)

    lo, hi = jax.lax.fori_loop(0, n_bisect, bisect, (mu_lo, mu_hi))
    z = jnp.clip(xf - 0.5 * (lo + hi)[:, None] * wf, 0.0, 1.0)
    return z.reshape(x.shape)


def _norms(v: Array, norm: str) -> Array:
    vf = _flat(v)
    if norm == "Linf":
        return jnp.max(jnp.abs(vf), axis=-1)
    return jnp.sqrt(jnp.sum(vf ** 2, axis=-1))


def fab_attack(model_fn: ModelFn, x: Array, y: Array, key: Array,
               cfg: FABConfig) -> Tuple[Array, Array]:
    """Returns (x_adv, found_mask): minimal-norm adversarials within eps."""
    B = x.shape[0]
    proj = (_proj_hyperplane_box_linf if cfg.norm == "Linf"
            else _proj_hyperplane_box_l2)

    logits_clean = model_fn(x, jax.random.fold_in(key, 17))
    order = jnp.argsort(logits_clean, axis=-1)

    best_norm = jnp.full((B,), jnp.inf)
    x_best = x
    found = jnp.zeros((B,), bool)

    for t_idx in range(cfg.n_target_classes):
        y_t = order[:, -(t_idx + 2)]
        for restart in range(cfg.n_restarts):
            k_r = jax.random.fold_in(key, t_idx * 131 + restart)
            if restart == 0:
                x_i = x
            else:
                u = (jax.random.uniform(k_r, x.shape) - 0.5) * 2
                r = jnp.minimum(best_norm, cfg.eps).reshape(-1, 1, 1, 1)
                if cfg.norm == "Linf":
                    x_i = jnp.clip(x + 0.5 * r * u, 0.0, 1.0)
                else:
                    un = _norms(u, "L2").reshape(-1, 1, 1, 1)
                    x_i = jnp.clip(x + 0.5 * r * u / jnp.maximum(un, 1e-12),
                                   0.0, 1.0)

            def body(carry, i):
                x_i, x_best, best_norm, found = carry
                k_i = jax.random.fold_in(k_r, i)

                def f_diff(xx):
                    lg = model_fn(xx, k_i)
                    fy = jnp.take_along_axis(lg, y[:, None], -1)[:, 0]
                    ft = jnp.take_along_axis(lg, y_t[:, None], -1)[:, 0]
                    return (fy - ft).sum(), (fy - ft)

                (_, fval), w = jax.value_and_grad(f_diff, has_aux=True)(x_i)
                # hyperplane w.z = b passes through the boundary linearization
                b_i = jnp.sum(_flat(w) * _flat(x_i), -1) - fval
                d1 = proj(x_i, w, b_i) - x_i
                d2 = proj(x, w, b_i) - x
                n1 = _norms(d1, cfg.norm)
                n2 = _norms(d2, cfg.norm)
                alpha = jnp.clip(n1 / jnp.maximum(n1 + n2, 1e-12), 0.0,
                                 cfg.alpha_max).reshape(-1, 1, 1, 1)
                x_new = jnp.clip(
                    (1 - alpha) * (x_i + cfg.eta * d1)
                    + alpha * (x + cfg.eta * d2), 0.0, 1.0)

                lg_new = model_fn(x_new, jax.random.fold_in(k_i, 3))
                is_adv = jnp.argmax(lg_new, -1) != y
                dist = _norms(x_new - x, cfg.norm)
                improve = is_adv & (dist < best_norm)
                x_best = jnp.where(improve[:, None, None, None], x_new, x_best)
                best_norm = jnp.where(improve, dist, best_norm)
                found = found | (is_adv & (dist <= cfg.eps))

                # backward step toward the original on success
                x_i = jnp.where(is_adv[:, None, None, None],
                                jnp.clip((1 - cfg.beta) * x + cfg.beta * x_new,
                                         0.0, 1.0),
                                x_new)
                return (x_i, x_best, best_norm, found), None

            from diffpure_tpu.utils.jitlift import scan_chunked
            (x_i, x_best, best_norm, found) = scan_chunked(
                body, (x_i, x_best, best_norm, found),
                jnp.arange(cfg.n_iter), cfg.iters_per_dispatch)

    ok = found & (best_norm <= cfg.eps)
    x_adv = jnp.where(ok[:, None, None, None], x_best, x)
    return x_adv, ok
