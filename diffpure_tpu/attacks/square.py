"""Square attack: gradient-free random search (Andriushchenko et al. 2020).

Faithful JAX port of AutoAttack's square attack semantics for Linf (stripe
init, shrinking square schedule, margin-based acceptance) and an L2 variant
with the eta meta-pattern. One lax.scan over queries; per-example square
positions/colors come from the counter-based PRNG, so the attack is a pure
function of (x, key).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from diffpure_tpu.attacks.losses import margin_loss

Array = jax.Array
ModelFn = Callable[[Array, Array], Array]


@dataclasses.dataclass(frozen=True)
class SquareConfig:
    norm: str = "Linf"
    eps: float = 8 / 255
    n_queries: int = 5000
    p_init: float = 0.8
    seed: int = 0
    # bound single-dispatch length when model_fn is an expensive defended
    # forward (execution-watchdog backends; utils/jitlift.scan_chunked)
    iters_per_dispatch: int = 0


def _p_selection(p_init: float, it: int, n_queries: int) -> float:
    """Piecewise square-size schedule (AutoAttack square.py)."""
    it = int(it / n_queries * 10000)
    if 10 < it <= 50:
        return p_init / 2
    if 50 < it <= 200:
        return p_init / 4
    if 200 < it <= 500:
        return p_init / 8
    if 500 < it <= 1000:
        return p_init / 16
    if 1000 < it <= 2000:
        return p_init / 32
    if 2000 < it <= 4000:
        return p_init / 64
    if 4000 < it <= 6000:
        return p_init / 128
    if 6000 < it <= 8000:
        return p_init / 256
    if 8000 < it:
        return p_init / 512
    return p_init


def _rect_mask(B: int, H: int, W: int, vh: Array, vw: Array, s: Array) -> Array:
    """(B,H,W,1) mask of an s x s square at per-example corner (vh, vw)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (B, H, W), 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (B, H, W), 2)
    vh = vh[:, None, None]
    vw = vw[:, None, None]
    s = s[:, None, None] if s.ndim == 1 else s
    mask = ((rows >= vh) & (rows < vh + s) & (cols >= vw) & (cols < vw + s))
    return mask[..., None]


def square_attack(model_fn: ModelFn, x: Array, y: Array, key: Array,
                  cfg: SquareConfig, draws: dict | None = None
                  ) -> Tuple[Array, Array]:
    """Returns (x_adv, found_mask).

    `draws` optionally injects the random sequence (tests: trajectory
    parity vs the upstream numpy loop given identical draws). Linf keys:
    stripes (B,1,W,C), vh/vw (n,B) ints, color (n,B,1,1,C). L2 keys:
    signs0 (ncells,B,1,1,C), transpose0 (ncells,B), vh/vw (n,B),
    signs (n,B,1,1,C), orient (n,B) in {0,1}.
    """
    if cfg.norm == "Linf":
        return _square_linf(model_fn, x, y, key, cfg, draws)
    if cfg.norm == "L2":
        return _square_l2(model_fn, x, y, key, cfg, draws)
    raise ValueError(cfg.norm)


def _square_linf(model_fn, x, y, key, cfg: SquareConfig, draws=None):
    B, H, W, C = x.shape
    eps = cfg.eps

    # vertical-stripe init (AA: per-column, per-channel +-eps)
    k0, key = jax.random.split(key)
    stripes = (draws["stripes"] if draws is not None else
               jax.random.choice(k0, jnp.array([-eps, eps]), (B, 1, W, C)))
    x_best = jnp.clip(x + stripes, 0.0, 1.0)
    margins = margin_loss(model_fn(x_best, jax.random.fold_in(key, 2**31 - 1)), y)

    # per-iter square sizes are static (schedule depends only on iter)
    n_feat = C * H * W
    s_sched = np.array(
        [max(int(round(np.sqrt(_p_selection(cfg.p_init, i, cfg.n_queries)
                               * n_feat / C))), 1)
         for i in range(cfg.n_queries)], dtype=np.int32)
    s_sched = np.minimum(s_sched, H - 1)

    def body(carry, it):
        x_best, margins, key = carry
        if draws is None:
            i, s = it
            k_iter = jax.random.fold_in(key, i)
            kh, kw, kc = jax.random.split(k_iter, 3)
            vh = jax.random.randint(kh, (B,), 0, H - s + 1)
            vw = jax.random.randint(kw, (B,), 0, W - s + 1)
            color = jax.random.choice(kc, jnp.array([-eps, eps]),
                                      (B, 1, 1, C))
        else:
            i, s, vh, vw, color = it
            k_iter = jax.random.fold_in(key, i)
        mask = _rect_mask(B, H, W, vh, vw,
                          jnp.full((B,), s, jnp.int32))
        delta = x_best - x
        new_delta = jnp.where(mask, jnp.clip(color, -eps, eps), delta)
        x_new = jnp.clip(jnp.clip(x + new_delta, x - eps, x + eps), 0.0, 1.0)

        m_new = margin_loss(model_fn(x_new, jax.random.fold_in(k_iter, 7)), y)
        # upstream freezes fooled examples (idx_to_fool = margin > 0)
        accept = (m_new < margins) & (margins > 0)
        x_best = jnp.where(accept[:, None, None, None], x_new, x_best)
        margins = jnp.where(accept, m_new, margins)
        return (x_best, margins, key), None

    its = (jnp.arange(cfg.n_queries), jnp.asarray(s_sched))
    if draws is not None:
        its = its + (jnp.asarray(draws["vh"]), jnp.asarray(draws["vw"]),
                     jnp.asarray(draws["color"]))
    from diffpure_tpu.utils.jitlift import scan_chunked
    (x_best, margins, _) = scan_chunked(body, (x_best, margins, key), its,
                                        cfg.iters_per_dispatch)
    found = margins < 0
    return jnp.where(found[:, None, None, None], x_best, x), found


def _pseudo_gaussian_rect(x: int, y: int) -> np.ndarray:
    """Concentric pseudo-Gaussian rings over an x*y rectangle
    (upstream square attack pseudo_gaussian_pert_rectangles)."""
    delta = np.zeros((x, y), dtype=np.float64)
    x_c, y_c = x // 2 + 1, y // 2 + 1
    counter2 = [x_c - 1, y_c - 1]
    for counter in range(0, max(x_c, y_c)):
        lo_r = max(counter2[0], 0)
        hi_r = min(counter2[0] + (2 * counter + 1), x)
        lo_c = max(counter2[1], 0)
        hi_c = min(counter2[1] + (2 * counter + 1), y)
        delta[lo_r:hi_r, lo_c:hi_c] += 1.0 / (counter + 1) ** 2
        counter2[0] -= 1
        counter2[1] -= 1
    norm = np.sqrt(np.sum(delta ** 2))
    if norm > 0:
        delta /= norm
    return delta


def _eta_pattern(s: int) -> np.ndarray:
    """L2 meta-pattern: a +/- dipole of pseudo-Gaussian halves, unit L2 norm
    (upstream meta_pseudo_gaussian_pert; the random transpose is applied by
    the caller via the orientation draw)."""
    delta = np.zeros((s, s), dtype=np.float64)
    if s // 2 > 0:
        delta[:s // 2] = _pseudo_gaussian_rect(s // 2, s)
        delta[s // 2:] = _pseudo_gaussian_rect(s - s // 2, s) * (-1.0)
    else:
        delta[:] = _pseudo_gaussian_rect(s, s)
    norm = np.sqrt(np.sum(delta ** 2))
    if norm > 0:
        delta /= norm
    return delta


def _square_l2(model_fn, x, y, key, cfg: SquareConfig, draws=None):
    B, H, W, C = x.shape
    eps = cfg.eps

    # init: grid of dipole eta patterns, per-cell random sign and
    # orientation (upstream l2 init: meta_pseudo_gaussian_pert per cell with
    # np.random transpose + per-(example,channel) sign)
    s0 = H // 5 if H // 5 >= 1 else 1
    k0, key = jax.random.split(key)
    eta0 = _eta_pattern(s0).astype(np.float32)
    # upstream anchors the eta grid at sp_init = (H - s0*(H//s0)) // 2 and
    # lays H//s0 x W//s0 cells (autoattack square.py l2 init) — centered,
    # not flush with row/col 0
    sp_h = (H - s0 * (H // s0)) // 2
    sp_w = (W - s0 * (W // s0)) // 2
    cells = [(sp_h + ih * s0, sp_w + iw * s0)
             for ih in range(H // s0) for iw in range(W // s0)]
    if draws is not None:
        cell_signs = draws["signs0"]          # (ncells, B, 1, 1, C)
        cell_tr = draws["transpose0"]         # (ncells, B) in {0,1}
    else:
        ks, kt = jax.random.split(k0)
        cell_signs = jax.random.choice(ks, jnp.array([-1.0, 1.0]),
                                       (len(cells), B, 1, 1, C))
        cell_tr = jax.random.bernoulli(kt, 0.5, (len(cells), B))
    d0 = jnp.zeros((B, H, W, C))
    eta0_j = jnp.asarray(eta0)
    eta0_t = jnp.asarray(eta0.T.copy())
    for ci, (ih, iw) in enumerate(cells):
        pat = jnp.where(cell_tr[ci][:, None, None, None],
                        eta0_t[None, :, :, None], eta0_j[None, :, :, None])
        d0 = d0.at[:, ih:ih + s0, iw:iw + s0, :].add(pat * cell_signs[ci])
    dn = jnp.sqrt(jnp.sum(d0.reshape(B, -1) ** 2, axis=-1)).reshape(-1, 1, 1, 1)
    x_best = jnp.clip(x + d0 / jnp.maximum(dn, 1e-12) * eps, 0.0, 1.0)
    margins = margin_loss(model_fn(x_best, jax.random.fold_in(key, 2**31 - 1)), y)

    n_feat = C * H * W
    s_sched = []
    etas = {}
    for i in range(cfg.n_queries):
        p = _p_selection(cfg.p_init, i, cfg.n_queries)
        s = max(int(round(np.sqrt(p * n_feat / C))), 3)
        if s % 2 == 0:
            s += 1
        s = min(s, H - 1 if (H - 1) % 2 == 1 else H - 2)
        s = max(s, 3)
        s_sched.append(s)
        if s not in etas:
            etas[s] = _eta_pattern(s)
    uniq = sorted(etas)
    # bank holds both orientations; a per-(iteration, example) draw picks one
    # (upstream applies a random transpose inside meta_pseudo_gaussian_pert)
    eta_bank = np.zeros((2, len(uniq), max(uniq), max(uniq)), np.float32)
    for j, s in enumerate(uniq):
        eta_bank[0, j, :s, :s] = etas[s]
        eta_bank[1, j, :s, :s] = etas[s].T
    s_to_idx = {s: j for j, s in enumerate(uniq)}
    idx_sched = np.array([s_to_idx[s] for s in s_sched], np.int32)
    smax = max(uniq)

    eta_bank_j = jnp.asarray(eta_bank)

    def body(carry, it):
        x_best, margins, key = carry
        if draws is None:
            i, s, eidx = it
            k_iter = jax.random.fold_in(key, i)
            kh, kw, kc, ko = jax.random.split(k_iter, 4)
            vh = jax.random.randint(kh, (B,), 0, H - s + 1)
            vw = jax.random.randint(kw, (B,), 0, W - s + 1)
            signs = jax.random.choice(kc, jnp.array([-1.0, 1.0]),
                                      (B, 1, 1, C))
            orient = jax.random.bernoulli(ko, 0.5, (B,)).astype(jnp.int32)
        else:
            i, s, eidx, vh, vw, signs, orient = it
            k_iter = jax.random.fold_in(key, i)
        mask = _rect_mask(B, H, W, vh, vw, jnp.full((B,), s, jnp.int32))

        # place the eta pattern at (vh, vw): roll a padded canvas per example
        def place(o_i, vh_i, vw_i):
            canvas = jnp.zeros((H, W)).at[:smax, :smax].set(
                eta_bank_j[o_i, eidx])
            return jnp.roll(jnp.roll(canvas, vh_i, axis=0), vw_i, axis=1)
        pattern = jax.vmap(place)(orient, vh, vw)[..., None] * signs

        delta = x_best - x
        # available norm budget (AA redistributes the removed window's mass)
        win_norm = jnp.sqrt(jnp.sum((delta * mask).reshape(B, -1) ** 2,
                                    axis=-1))
        total_norm = jnp.sqrt(jnp.sum(delta.reshape(B, -1) ** 2, axis=-1))
        rest = jnp.sqrt(jnp.maximum(eps ** 2 - (total_norm ** 2
                                                - win_norm ** 2), 0.0))
        new_win = pattern * rest.reshape(-1, 1, 1, 1)
        new_delta = jnp.where(mask, new_win, delta)
        ndn = jnp.sqrt(jnp.sum(new_delta.reshape(B, -1) ** 2,
                               axis=-1)).reshape(-1, 1, 1, 1)
        new_delta = new_delta * jnp.minimum(1.0, eps / jnp.maximum(ndn, 1e-12))
        x_new = jnp.clip(x + new_delta, 0.0, 1.0)

        m_new = margin_loss(model_fn(x_new, jax.random.fold_in(k_iter, 7)), y)
        # upstream freezes fooled examples (idx_to_fool = margin > 0)
        accept = (m_new < margins) & (margins > 0)
        x_best = jnp.where(accept[:, None, None, None], x_new, x_best)
        margins = jnp.where(accept, m_new, margins)
        return (x_best, margins, key), None

    its = (jnp.arange(cfg.n_queries), jnp.asarray(s_sched, jnp.int32),
           jnp.asarray(idx_sched))
    if draws is not None:
        its = its + (jnp.asarray(draws["vh"]), jnp.asarray(draws["vw"]),
                     jnp.asarray(draws["signs"]),
                     jnp.asarray(draws["orient"], jnp.int32))
    from diffpure_tpu.utils.jitlift import scan_chunked
    (x_best, margins, _) = scan_chunked(body, (x_best, margins, key), its,
                                        cfg.iters_per_dispatch)
    found = margins < 0
    return jnp.where(found[:, None, None, None], x_best, x), found
