"""StAdv: spatially-transformed adversarial examples with EOT.

Faithful rebuild of the reference's mister_ed-based StAdv attack
(ref stadv_eot/attacks.py:123-136 + recoloradv/mister_ed): the perturbation
is a full sampling grid (FullSpatial, ref spatial_transformers.py:107-291)
optimized with Adam (lr=0.01, unsigned steps) on
    minimize  CW-f6(logits, y; kappa=inf) + (0.0025/bound) * stAdv_TV(flow)
with EOT gradient averaging, per-example keep-best (by the negated loss),
Linf projection of the grid to within `bound` of the identity grid and
clipping to [-1,1] each forward (ref ParameterizedXformAdv.project_params).
DiffPure runs 100 iterations with eot_iter=20 (ref eval_sde_adv.py:175,195).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import optax

from diffpure_tpu.ops.grid_sample import grid_sample, identity_grid

Array = jax.Array
ModelFn = Callable[[Array, Array], Array]


@dataclasses.dataclass(frozen=True)
class StAdvConfig:
    bound: float = 0.05
    n_iter: int = 100
    lr: float = 0.01
    eot_iter: int = 1
    kappa: float = float("inf")
    # >0: scan at most this many iterations per device dispatch (bounds
    # single-execution time on remote backends; same math, carry stays on
    # device). 0 = whole attack in one scan program.
    iters_per_dispatch: int = 0

    @property
    def flow_loss_coef(self) -> float:
        return 0.0025 / self.bound  # ref attacks.py:133


def stadv_tv_norm(delta: Array) -> Array:
    """Flow smoothness: sum over pixels/neighbors of sqrt(|d-d_nbr|^2+1e-10).

    delta: (B, H, W, 2) grid offset from identity. Edge-replicated neighbor
    shifts replicate the reference's boundary-adjusted permutation matrices
    (ref spatial_transformers.py:147-213).
    """
    d = delta  # (B, H, W, 2)
    total = jnp.zeros(d.shape[0])
    for axis, shift in [(1, 1), (1, -1), (2, 1), (2, -1)]:
        nbr = jnp.roll(d, shift, axis=axis)
        # edge replicate: the rolled-in row/col equals the edge itself
        if axis == 1 and shift == 1:
            nbr = nbr.at[:, 0].set(d[:, 0])
        elif axis == 1 and shift == -1:
            nbr = nbr.at[:, -1].set(d[:, -1])
        elif axis == 2 and shift == 1:
            nbr = nbr.at[:, :, 0].set(d[:, :, 0])
        else:
            nbr = nbr.at[:, :, -1].set(d[:, :, -1])
        diff2 = jnp.sum((d - nbr) ** 2, axis=-1)
        total = total + jnp.sum(jnp.sqrt(diff2 + 1e-10), axis=(1, 2))
    return total


def _cw_f6(logits: Array, y: Array, kappa: float) -> Array:
    """clamp(z_y - max_other, min=-kappa) (ref loss_functions.py:214-244)."""
    z_y = jnp.take_along_axis(logits, y[:, None], -1)[:, 0]
    masked = jnp.where(jax.nn.one_hot(y, logits.shape[-1], dtype=bool),
                       -jnp.inf, logits)
    max_other = jnp.max(masked, axis=-1)
    out = z_y - max_other
    if kappa != float("inf"):
        out = jnp.maximum(out, -kappa)
    return out


def _constrain(grid: Array, ident: Array, bound: float) -> Array:
    """clip to [-1,1] then Linf-project to within bound of identity
    (ref spatial_transformers.py:231-243,260-285)."""
    g = jnp.clip(grid, -1.0, 1.0)
    return jnp.clip(g, ident - bound, ident + bound)


def stadv_attack(model_fn: ModelFn, x: Array, y: Array, key: Array,
                 cfg: StAdvConfig) -> Tuple[Array, Array]:
    """Returns (x_adv, found_mask)."""
    B, H, W, C = x.shape
    ident = identity_grid(B, H, W)
    grid = ident  # FullSpatial initializes at identity

    opt = optax.adam(cfg.lr)
    opt_state = opt.init(grid)

    def objective(grid, k):
        g = _constrain(grid, ident, cfg.bound)
        x_t = grid_sample(x, g)
        logits = model_fn(x_t, k)
        cw = _cw_f6(logits, y, cfg.kappa)
        tv = stadv_tv_norm(g - ident)
        per_ex = cw + cfg.flow_loss_coef * tv  # minimize
        return per_ex.sum(), per_ex

    from diffpure_tpu.attacks.eot import eot_average

    def body(carry, i):
        grid, opt_state, best_grid, best_score = carry
        k_i = jax.random.fold_in(key, i)

        def single(k):
            (_, pe), g = jax.value_and_grad(objective, has_aux=True)(grid, k)
            return g, pe

        g, per_ex = eot_average(single, k_i, cfg.eot_iter)

        updates, opt_state = opt.update(g, opt_state, grid)
        grid = optax.apply_updates(grid, updates)

        # keep-best by the minimized objective (ref PGD keep_best)
        improved = per_ex < best_score
        best_grid = jnp.where(improved[:, None, None, None], grid, best_grid)
        best_score = jnp.minimum(per_ex, best_score)
        return (grid, opt_state, best_grid, best_score), None

    init = (grid, opt_state, grid, jnp.full((B,), jnp.inf))
    if cfg.iters_per_dispatch <= 0:
        (grid, _, best_grid, _), _ = jax.lax.scan(body, init,
                                                  jnp.arange(cfg.n_iter))
    else:
        # bounded dispatches: jit_lifted hoists the closures' arrays
        # (x, y, key, model params) to arguments
        from diffpure_tpu.utils.jitlift import jit_lifted

        def raw_chunk(carry, idxs):
            carry, _ = jax.lax.scan(body, carry, idxs)
            return carry

        carry = init
        chunk_fns = {}
        step = cfg.iters_per_dispatch
        for s in range(0, cfg.n_iter, step):
            idxs = jnp.arange(s, min(s + step, cfg.n_iter))
            n = int(idxs.shape[0])
            if n not in chunk_fns:
                chunk_fns[n] = jit_lifted(raw_chunk, carry, idxs)
            carry = chunk_fns[n](carry, idxs)
        grid, _, best_grid, _ = carry

    g_final = _constrain(best_grid, ident, cfg.bound)
    x_adv = grid_sample(x, g_final)
    logits = model_fn(x_adv, jax.random.fold_in(key, 123_456))
    found = jnp.argmax(logits, -1) != y
    return x_adv, found
