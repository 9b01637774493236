"""Resumable robustness evaluation.

The reference has no resume for interrupted evals (SURVEY.md §5.3 — a
multi-day AutoAttack run that dies loses everything except saved adv
tensors). Here each attack phase checkpoints (x_adv, robust_flags) to disk;
re-running the same eval skips completed phases and continues mid-suite.
"""
from __future__ import annotations

import json
import os
from typing import Optional, Tuple

import numpy as np


class EvalCheckpoint:
    """Per-phase (x_adv, robust) persistence under <log_dir>/eval_state/."""

    def __init__(self, log_dir: str):
        self.dir = os.path.join(log_dir, "eval_state")
        os.makedirs(self.dir, exist_ok=True)
        self._meta_path = os.path.join(self.dir, "meta.json")
        self.meta = {}
        if os.path.exists(self._meta_path):
            with open(self._meta_path) as f:
                self.meta = json.load(f)

    def has_phase(self, name: str) -> bool:
        return name in self.meta.get("completed", [])

    def load_phase(self, name: str) -> Tuple[np.ndarray, np.ndarray]:
        x_adv = np.load(os.path.join(self.dir, f"{name}_x_adv.npy"))
        robust = np.load(os.path.join(self.dir, f"{name}_robust.npy"))
        return x_adv, robust

    def save_phase(self, name: str, x_adv, robust) -> None:
        np.save(os.path.join(self.dir, f"{name}_x_adv.npy"),
                np.asarray(x_adv))
        np.save(os.path.join(self.dir, f"{name}_robust.npy"),
                np.asarray(robust))
        completed = self.meta.setdefault("completed", [])
        if name not in completed:
            completed.append(name)
        with open(self._meta_path, "w") as f:
            json.dump(self.meta, f)


def resumable_autoattack(aa, x, y, key, log_dir: Optional[str] = None):
    """Run an AutoAttack suite with per-attack resume.

    `aa` is an attacks.AutoAttack instance. Falls back to the plain run when
    log_dir is None.
    """
    import jax
    import jax.numpy as jnp

    if log_dir is None:
        return aa.run_standard_evaluation(x, y, key)

    ckpt = EvalCheckpoint(log_dir)
    logits = aa.model_fn(x, jax.random.fold_in(key, 7))
    robust = np.asarray(jnp.argmax(logits, -1) == y)
    x_adv = np.asarray(x).copy()

    for i, name in enumerate(aa.attacks):
        if ckpt.has_phase(name):
            x_adv, robust = ckpt.load_phase(name)
            aa.log(f"{name}: resumed "
                   f"(robust accuracy {robust.mean():.2%})")
            continue
        if not robust.any():
            ckpt.save_phase(name, x_adv, robust)
            continue
        xa, found = aa._run_one(name, x, y, jax.random.fold_in(key, i))
        xa = np.asarray(xa)
        found = np.asarray(found)
        newly = robust & found
        x_adv[newly] = xa[newly]
        robust = robust & ~found
        ckpt.save_phase(name, x_adv, robust)
        aa.log(f"{name}: robust accuracy {robust.mean():.2%} (checkpointed)")

    return jnp.asarray(x_adv), jnp.asarray(robust)
