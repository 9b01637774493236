"""Robustness-evaluation drivers.

Rebuild of the two reference entry points:
  - eval_autoattack / eval_stadv (ref eval_sde_adv.py:96-208)
  - eval_bpda (ref eval_sde_adv_bpda.py:121-174)
Each first measures the undefended classifier under the same attack
(the paired-baseline sanity check, SURVEY.md §4.4), then attacks through the
purifier, saving adversarial tensors per phase.
"""
from __future__ import annotations

import os
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from diffpure_tpu.attacks import (
    AutoAttack, AutoAttackConfig, BPDAEOTConfig, StAdvConfig,
    bpda_eot_attack, stadv_attack,
)
from diffpure_tpu.eval.accuracy import get_accuracy
from diffpure_tpu.eval.defended import DefendedModel

Array = jax.Array


def _save(log_dir: Optional[str], name: str, arr) -> None:
    if log_dir:
        os.makedirs(log_dir, exist_ok=True)
        np.save(os.path.join(log_dir, name), np.asarray(arr))


def eval_autoattack(defended: DefendedModel, x: Array, y: Array, key: Array,
                    aa_cfg: AutoAttackConfig, log_dir: Optional[str] = None,
                    log=print):
    """ref eval_sde_adv.py:96-155. Returns dict of accuracies."""
    results = {}

    # --- baseline: attack the undefended classifier (ref :114-133) ---------
    clf_fn = lambda x01, k: defended.classify(x01)
    t0 = time.time()
    aa_base = AutoAttack(clf_fn, aa_cfg, log_fn=lambda s: log(f"[clf] {s}"))
    x_adv_base, robust_base = aa_base.run_standard_evaluation(
        x, y, jax.random.fold_in(key, 0))
    results["classifier_robust_acc"] = float(np.asarray(robust_base).mean())
    _save(log_dir, f"x_adv_classifier_{aa_cfg.version}.npy", x_adv_base)
    log(f"x_adv_base produced in {time.time() - t0:.1f}s; "
        f"undefended robust acc {results['classifier_robust_acc']:.2%}")

    # --- attack THROUGH the purifier (ref :138-155) -------------------------
    t0 = time.time()
    aa_def = AutoAttack(defended, aa_cfg, log_fn=lambda s: log(f"[sde] {s}"))
    x_adv, robust = aa_def.run_standard_evaluation(
        x, y, jax.random.fold_in(key, 1))
    results["defended_robust_acc"] = float(np.asarray(robust).mean())
    _save(log_dir, f"x_adv_defended_{aa_cfg.version}.npy", x_adv)
    log(f"x_adv_sde produced in {time.time() - t0:.1f}s; "
        f"defended robust acc {results['defended_robust_acc']:.2%}")
    return results


def eval_stadv(defended: DefendedModel, x: Array, y: Array, key: Array,
               cfg: StAdvConfig, log_dir: Optional[str] = None, log=print):
    """ref eval_sde_adv.py:158-208."""
    results = {}
    clf_fn = lambda x01, k: defended.classify(x01)

    acc_clean = get_accuracy(clf_fn, x, y, jax.random.fold_in(key, 10))
    log(f"clean accuracy of classifier: {acc_clean:.2%}")

    x_adv_base, _ = stadv_attack(clf_fn, x, y, jax.random.fold_in(key, 0), cfg)
    results["classifier_robust_acc"] = get_accuracy(
        clf_fn, x_adv_base, y, jax.random.fold_in(key, 11))
    _save(log_dir, "x_adv_classifier_stadv.npy", x_adv_base)
    log(f"robust accuracy of classifier: "
        f"{results['classifier_robust_acc']:.2%}")

    acc_def_clean = get_accuracy(defended, x, y, jax.random.fold_in(key, 12))
    log(f"clean accuracy of defended model: {acc_def_clean:.2%}")
    results["defended_clean_acc"] = acc_def_clean

    x_adv, _ = stadv_attack(defended, x, y, jax.random.fold_in(key, 1), cfg)
    results["defended_robust_acc"] = get_accuracy(
        defended, x_adv, y, jax.random.fold_in(key, 13))
    _save(log_dir, "x_adv_defended_stadv.npy", x_adv)
    log(f"robust accuracy of defended model: "
        f"{results['defended_robust_acc']:.2%}")
    return results


def eval_bpda(defended: DefendedModel, x: Array, y: Array, key: Array,
              cfg: BPDAEOTConfig, log_dir: Optional[str] = None, log=print,
              run_baseline: bool = True):
    """ref eval_sde_adv_bpda.py:121-174. Returns accuracies + defended
    matrix. The undefended classifier is attacked first with the same PGD
    (ResNet_Adv_Model baseline, ref :129-150)."""
    results = {}

    if run_baseline:
        from diffpure_tpu.eval.defended import UndefendedModel
        base = UndefendedModel(
            classifier_fn=lambda p, x01: defended.classify(x01),
            classifier_params=None)
        t0 = time.time()
        _, base_matrix = bpda_eot_attack(base.purify, base.classify, x, y,
                                         jax.random.fold_in(key, 999), cfg,
                                         log=lambda s: log(f"[clf] {s}"))
        results["classifier_init_acc"] = float(base_matrix[0].mean())
        results["classifier_robust_acc"] = float(base_matrix[-1].mean())
        log(f"[clf] init acc: {results['classifier_init_acc']:.2%}, "
            f"robust acc: {results['classifier_robust_acc']:.2%} "
            f"({time.time() - t0:.1f}s)")

    t0 = time.time()
    x_adv, class_batch = bpda_eot_attack(defended.purify, defended.classify,
                                         x, y, key, cfg, log=log)
    _save(log_dir, "x_adv_bpda.npy", x_adv)
    results["init_acc"] = float(class_batch[0].mean())
    results["robust_acc"] = float(class_batch[-1].mean())
    results["class_batch"] = class_batch
    log(f"init acc: {results['init_acc']:.2%}, "
        f"robust acc: {results['robust_acc']:.2%} "
        f"({time.time() - t0:.1f}s)")
    return results


def robustness_eval(defended: DefendedModel, x: Array, y: Array, key: Array,
                    attack_version: str, log_dir: Optional[str] = None,
                    log=print, **attack_kwargs):
    """Top-level dispatch (ref eval_sde_adv.py:211-242 + bpda driver)."""
    if attack_version in ("standard", "rand", "custom"):
        aa_cfg = AutoAttackConfig(version=attack_version, **attack_kwargs)
        return eval_autoattack(defended, x, y, key, aa_cfg, log_dir, log)
    if attack_version == "stadv":
        cfg = StAdvConfig(**attack_kwargs)
        return eval_stadv(defended, x, y, key, cfg, log_dir, log)
    if attack_version == "bpda":
        cfg = BPDAEOTConfig(**attack_kwargs)
        return eval_bpda(defended, x, y, key, cfg, log_dir, log)
    raise ValueError(f"unknown attack version {attack_version}")
