"""Dose-response + de-saturation artifacts on the analytic-score harness.

Two measurements the trained-weights demo cannot produce cheaply, using
the Gaussian-mixture variant whose VP-SDE score is closed form
(data/synthetic.gmm_vp_eps_model) — the purifier runs the REAL
runner/solver/attack stack with an exact score oracle, so these are
properties of the defense/attack machinery, not of score-model training:

1. dose-response: white-box APGD-EOT *through the purifier* at
   t* in {0, 2, 5, 25, 100}; t*=0 is the identity purifier (the attack
   machinery must win -> collapse to the undefended level). Ref
   measurement semantics: eval_sde_adv.py:211-243.
2. de-saturation: a harder mixture (more classes, closer means, thicker
   noise) where t*=100 purification can no longer restore the signal
   perfectly — defended robust accuracy lands strictly between undefended
   and clean (the reference's CIFAR regime: ~71% robust vs ~89% clean).

Runs on CPU in minutes; deterministic seeds. Writes
docs/defense_dose_gmm/results.json and prints the tables.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from diffpure_tpu.attacks import AutoAttack, AutoAttackConfig  # noqa: E402
from diffpure_tpu.attacks.apgd import APGDConfig, apgd_attack  # noqa: E402
from diffpure_tpu.classifiers.small_cnn import train_classifier  # noqa: E402
from diffpure_tpu.data.synthetic import (SyntheticSpec,  # noqa: E402
                                         gmm_vp_eps_model, sample_gmm_batch)
from diffpure_tpu.eval import DefendedModel  # noqa: E402
from diffpure_tpu.purify import PurifyConfig  # noqa: E402

EPS = 16 / 255


def build(spec, amp, sig, clf_steps=400, n_train=512, width=8, n_eval=64,
          seed=0):
    sample = lambda k, n: sample_gmm_batch(k, n, spec, amp, sig)  # noqa: E731
    clf, clf_params, _ = train_classifier(
        jax.random.PRNGKey(seed), sample, n_classes=spec.n_classes,
        steps=clf_steps, n_train=n_train, arch="cnn", width=width)
    x, y = sample(jax.random.PRNGKey(seed + 5), n_eval)
    x01 = (x + 1.0) * 0.5
    clf_fn = lambda x01_, k: clf.apply(clf_params, x01_)  # noqa: E731
    return clf, clf_params, clf_fn, x01, y


def defended_at(spec, amp, sig, clf, clf_params, t):
    cfg = PurifyConfig(diffusion_type="sde", t=t, score_type="score_sde",
                       grad_mode="checkpoint")
    return DefendedModel(
        score_model_fn=gmm_vp_eps_model(spec, amp, sig), score_params=None,
        classifier_fn=lambda p, a: clf.apply(clf_params, a),
        classifier_params=None, purify_cfg=cfg, log_every=0)


def vote(model_fn, x01, y, key, reps=8):
    probs = None
    for r in range(reps):
        p = jax.nn.softmax(model_fn(x01, jax.random.fold_in(key, r)), -1)
        probs = p if probs is None else probs + p
    return float((jnp.argmax(probs, -1) == y).mean())


def dose_response(out):
    spec = SyntheticSpec(size=8)
    amp, sig = 0.25, 0.08
    clf, clf_params, clf_fn, x01, y = build(spec, amp, sig)
    key = jax.random.PRNGKey(11)

    aa = AutoAttack(clf_fn, AutoAttackConfig(
        version="custom", attacks_to_run=("apgd-ce", "apgd-t"), eps=EPS,
        n_iter=50, apgd_t_n_target_classes=3), log_fn=lambda s: None)
    _, rob = aa.run_standard_evaluation(x01, y, jax.random.PRNGKey(7))
    undef = float(np.asarray(rob).mean())
    clean = vote(lambda a, k: clf_fn(a, k), x01, y, key, reps=1)
    out["dose_response"] = {"clean_undefended": clean,
                            "robust_undefended": undef, "curve": {}}
    print(f"[dose] clean {clean:.2%}, undefended robust {undef:.2%}",
          flush=True)

    acfg = APGDConfig(norm="Linf", eps=EPS, n_iter=30, eot_iter=3,
                      loss="ce")
    for t in (0, 2, 5, 25, 100):
        t0 = time.time()
        d = (clf_fn if t == 0
             else defended_at(spec, amp, sig, clf, clf_params, t))
        x_adv, _ = apgd_attack(d, x01, y, jax.random.fold_in(key, 50 + t),
                               acfg)
        acc = vote(d, x_adv, y, jax.random.fold_in(key, 80 + t),
                   reps=1 if t == 0 else 8)
        out["dose_response"]["curve"][str(t)] = acc
        print(f"[dose] t*={t}: defended robust {acc:.2%} "
              f"({time.time() - t0:.0f}s)", flush=True)


def hard_mixture(out):
    """The de-saturated regime (calibrated in round 4): 8 orientation
    classes at amplitude 0.09 put adjacent class means ~1.06 apart in L2 —
    large enough that the classifier and the purifier posterior both work
    (clean 100%, defended clean ~98%), small enough that t*=100 forward
    noise (std 0.32/pixel) makes the purifier posterior genuinely
    ambiguous under attack pressure. At eps=8/255 the attacker cannot
    semantically cross the class boundary (L2 reach 0.43 < half-separation)
    yet breaks the bare CNN to 0%; white-box APGD-EOT through the exact
    purifier lands strictly between — the reference's CIFAR shape
    (~71% robust vs ~89% clean, BASELINE.md) rather than a saturated 100%.
    NOTE eps=8/255 here (the CIFAR radius), not the 16/255 the saturated
    demo uses: at 16/255 the L2 reach (0.87) nearly equals the separation,
    the perturbed input legitimately belongs to the wrong class's
    posterior, and even a Bayes-optimal defense loses (~2% defended) —
    that regime measures semantics, not robustness."""
    eps = 8 / 255
    spec = SyntheticSpec(size=8, n_classes=8, freq=2.0)
    amp, sig = 0.09, 0.10
    clf, clf_params, clf_fn, x01, y = build(spec, amp, sig,
                                            clf_steps=1200, width=24,
                                            n_train=1024)
    key = jax.random.PRNGKey(21)
    clean = vote(lambda a, k: clf_fn(a, k), x01, y, key, reps=1)

    aa = AutoAttack(clf_fn, AutoAttackConfig(
        version="custom", attacks_to_run=("apgd-ce", "apgd-t"), eps=eps,
        n_iter=50, apgd_t_n_target_classes=3), log_fn=lambda s: None)
    _, rob = aa.run_standard_evaluation(x01, y, jax.random.PRNGKey(9))
    undef = float(np.asarray(rob).mean())

    d = defended_at(spec, amp, sig, clf, clf_params, 100)
    clean_def = vote(d, x01, y, jax.random.fold_in(key, 1))
    acfg = APGDConfig(norm="Linf", eps=eps, n_iter=30, eot_iter=3,
                      loss="ce")
    x_adv, _ = apgd_attack(d, x01, y, jax.random.fold_in(key, 2), acfg)
    rob_def = vote(d, x_adv, y, jax.random.fold_in(key, 3))
    out["hard_mixture"] = {
        "n_classes": 8, "sigma": sig, "amp": amp, "eps": eps,
        "clean_undefended": clean, "robust_undefended": undef,
        "clean_defended": clean_def, "robust_defended_whitebox": rob_def}
    print(f"[hard] clean {clean:.2%} | undefended robust {undef:.2%} | "
          f"defended clean {clean_def:.2%} | defended robust {rob_def:.2%}",
          flush=True)


def main():
    out = {}
    dose_response(out)
    hard_mixture(out)
    os.makedirs("docs/defense_dose_gmm", exist_ok=True)
    with open("docs/defense_dose_gmm/results.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
