"""AutoAttack suite orchestration: standard / rand / custom versions.

Mirrors the torch-only `autoattack` package's run_standard_evaluation and
the reference's version selection (ref eval_sde_adv.py:103-131):
  - 'standard': [apgd-ce, apgd-t, fab-t, square]
  - 'rand':     [apgd-ce, apgd-dlr] with EOT (eot_iter, for stochastic
                defenses; ref eval_sde_adv.py:126-128)
  - 'custom':   user-selected subset via attacks_to_run

Each attack only runs on examples still classified correctly (robust_flags
protocol); robust accuracy = fraction surviving all attacks.
"""
from __future__ import annotations

import dataclasses
import time
from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from diffpure_tpu.attacks.apgd import APGDConfig, apgd_attack
from diffpure_tpu.attacks.fab import FABConfig, fab_attack
from diffpure_tpu.attacks.square import SquareConfig, square_attack

Array = jax.Array
ModelFn = Callable[[Array, Array], Array]


@dataclasses.dataclass(frozen=True)
class AutoAttackConfig:
    norm: str = "Linf"
    eps: float = 8 / 255
    version: str = "standard"  # 'standard' | 'rand' | 'custom'
    attacks_to_run: Tuple[str, ...] = ()
    eot_iter: int = 1
    n_iter: int = 100
    square_n_queries: int = 5000
    fab_n_target_classes: int = 9
    apgd_n_restarts: int = 1
    apgd_t_n_target_classes: int = 9
    seed: int = 0
    # bound APGD single-dispatch length (see APGDConfig.iters_per_dispatch)
    apgd_iters_per_dispatch: int = 0
    # same for FAB-T iterations and Square queries (the whole suite must
    # dispatch-chunk when the defended forward is minutes-per-call)
    fab_iters_per_dispatch: int = 0
    square_iters_per_dispatch: int = 0


class AutoAttack:
    """Suite runner. model_fn(x01, key) -> logits."""

    def __init__(self, model_fn: ModelFn, cfg: AutoAttackConfig,
                 log_fn=print, on_phase=None):
        self.model_fn = model_fn
        self.cfg = cfg
        self.log = log_fn
        # called with phase_results after each finished attack phase —
        # hook for persisting suite progress mid-run
        self.on_phase = on_phase
        if cfg.version == "standard":
            self.attacks = ["apgd-ce", "apgd-t", "fab-t", "square"]
        elif cfg.version == "rand":
            self.attacks = ["apgd-ce", "apgd-dlr"]
        elif cfg.version == "custom":
            self.attacks = list(cfg.attacks_to_run)
        else:
            raise ValueError(cfg.version)

    def _run_one(self, name: str, x, y, key):
        cfg = self.cfg
        if name == "apgd-ce":
            a = APGDConfig(norm=cfg.norm, eps=cfg.eps, n_iter=cfg.n_iter,
                           n_restarts=cfg.apgd_n_restarts,
                           eot_iter=cfg.eot_iter, loss="ce",
                           iters_per_dispatch=cfg.apgd_iters_per_dispatch)
            return apgd_attack(self.model_fn, x, y, key, a)
        if name == "apgd-dlr":
            a = APGDConfig(norm=cfg.norm, eps=cfg.eps, n_iter=cfg.n_iter,
                           n_restarts=cfg.apgd_n_restarts,
                           eot_iter=cfg.eot_iter, loss="dlr",
                           iters_per_dispatch=cfg.apgd_iters_per_dispatch)
            return apgd_attack(self.model_fn, x, y, key, a)
        if name == "apgd-t":
            a = APGDConfig(norm=cfg.norm, eps=cfg.eps, n_iter=cfg.n_iter,
                           eot_iter=cfg.eot_iter, loss="dlr-targeted",
                           n_target_classes=cfg.apgd_t_n_target_classes,
                           iters_per_dispatch=cfg.apgd_iters_per_dispatch)
            return apgd_attack(self.model_fn, x, y, key, a)
        if name == "fab-t":
            a = FABConfig(norm=cfg.norm, eps=cfg.eps, n_iter=cfg.n_iter,
                          n_target_classes=cfg.fab_n_target_classes,
                          iters_per_dispatch=cfg.fab_iters_per_dispatch)
            return fab_attack(self.model_fn, x, y, key, a)
        if name == "square":
            a = SquareConfig(norm=cfg.norm, eps=cfg.eps,
                             n_queries=cfg.square_n_queries,
                             iters_per_dispatch=cfg.square_iters_per_dispatch)
            return square_attack(self.model_fn, x, y, key, a)
        raise ValueError(name)

    def run_standard_evaluation(self, x: Array, y: Array, key: Array,
                                bs: Optional[int] = None
                                ) -> Tuple[Array, Array]:
        """Returns (x_adv, robust_flags).

        Upstream's robust_flags protocol: each attack phase gathers the
        still-robust subset and attacks ONLY those examples (re-attacking
        fallen ones is pure waste at ~15 chip-hours per APGD phase). The
        subset is padded to a static power-of-two bucket (capped at `bs`)
        so shrinking robust counts reuse a handful of compiled programs
        instead of recompiling per count.
        """
        logits = self.model_fn(x, jax.random.fold_in(key, 7))
        robust = np.asarray(jnp.argmax(logits, -1) == y).copy()
        self.log(f"initial accuracy: {robust.mean():.2%}")
        x_np = np.asarray(x)
        y_np = np.asarray(y)
        x_adv = x_np.copy()
        n = x.shape[0]
        bs = bs or n
        self.phase_batch_sizes: List[int] = []  # per phase: examples attacked
        # per finished phase: (attack name, robust acc after it, attacked
        # count, seconds) — lets a caller persist suite progress so a
        # killed multi-hour run still leaves its finished phases on disk
        self.phase_results: List[Tuple[str, float, int, float]] = []

        for i, name in enumerate(self.attacks):
            idx = np.nonzero(robust)[0]
            if idx.size == 0:
                break
            t0 = time.time()
            self.phase_batch_sizes.append(int(idx.size))
            bucket = min(bs, _next_pow2(idx.size))
            for start in range(0, idx.size, bucket):
                take = idx[start:start + bucket]
                pad = bucket - take.size  # pad final chunk with duplicates
                sel = np.concatenate([take, take[:1].repeat(pad)]) \
                    if pad else take
                xa, found = self._run_one(
                    name, jnp.asarray(x_np[sel]), jnp.asarray(y_np[sel]),
                    jax.random.fold_in(key, i * 1000 + start))
                xa = np.asarray(xa)[:take.size]
                found = np.asarray(found)[:take.size]
                x_adv[take[found]] = xa[found]
                robust[take[found]] = False
            self.log(f"{name}: robust accuracy {robust.mean():.2%} "
                     f"(attacked {idx.size}, {time.time() - t0:.1f}s)")
            self.phase_results.append(
                (name, float(robust.mean()), int(idx.size),
                 round(time.time() - t0, 1)))
            if self.on_phase is not None:
                self.on_phase(self.phase_results)

        return jnp.asarray(x_adv), jnp.asarray(robust)


def _next_pow2(k: int) -> int:
    p = 1
    while p < k:
        p *= 2
    return p
