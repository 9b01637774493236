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


class AutoAttack:
    """Suite runner. model_fn(x01, key) -> logits."""

    def __init__(self, model_fn: ModelFn, cfg: AutoAttackConfig,
                 log_fn=print):
        self.model_fn = model_fn
        self.cfg = cfg
        self.log = log_fn
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
                          n_target_classes=cfg.fab_n_target_classes)
            return fab_attack(self.model_fn, x, y, key, a)
        if name == "square":
            a = SquareConfig(norm=cfg.norm, eps=cfg.eps,
                             n_queries=cfg.square_n_queries)
            return square_attack(self.model_fn, x, y, key, a)
        raise ValueError(name)

    def run_standard_evaluation(self, x: Array, y: Array, key: Array,
                                bs: Optional[int] = None
                                ) -> Tuple[Array, Array]:
        """Returns (x_adv, robust_flags). Attacks run sequentially on the
        still-robust subset (flag protocol of upstream autoattack). With
        `bs`, examples are processed in fixed-size chunks (upstream's
        minibatching; keeps the attack program at one static shape)."""
        logits = self.model_fn(x, jax.random.fold_in(key, 7))
        robust = np.asarray(jnp.argmax(logits, -1) == y).copy()
        self.log(f"initial accuracy: {robust.mean():.2%}")
        x_adv = np.asarray(x).copy()
        n = x.shape[0]
        bs = bs or n

        for i, name in enumerate(self.attacks):
            if not robust.any():
                break
            t0 = time.time()
            for start in range(0, n, bs):
                sl = slice(start, min(start + bs, n))
                xa, found = self._run_one(
                    name, x[sl], y[sl],
                    jax.random.fold_in(key, i * 1000 + start))
                xa = np.asarray(xa)
                found = np.asarray(found)
                newly = robust[sl] & found
                chunk = x_adv[sl]
                chunk[newly] = xa[newly]
                x_adv[sl] = chunk
                robust[sl] = robust[sl] & ~found
            self.log(f"{name}: robust accuracy {robust.mean():.2%} "
                     f"({time.time() - t0:.1f}s)")

        return jnp.asarray(x_adv), jnp.asarray(robust)
