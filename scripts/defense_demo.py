"""Run the in-env trained-weights defense demonstration.

Trains the demo classifier + score model (diffpure_tpu/experiments/
defense_demo.py), runs the reference protocol (undefended vs defended,
APGD-EOT white-box + BPDA+EOT), optionally for both Euler-t* and
DPM-Solver++(2M)@20 purification (defense-equivalence), and writes
results JSON + a markdown report.

Usage:
  python scripts/defense_demo.py --platform cpu --out docs/defense_demo
  python scripts/defense_demo.py                 # real TPU chip
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None,
                    help="force jax platform (e.g. cpu)")
    ap.add_argument("--out", default="docs/defense_demo")
    ap.add_argument("--score_steps", type=int, default=None)
    ap.add_argument("--dpm", action="store_true",
                    help="also run DPM-Solver++@20 defense-equivalence")
    ap.add_argument("--dtypes", default=None,
                    help="comma list of purification diffusion types to "
                         "run (sde,dpm); overrides --dpm. A resume leg "
                         "whose sde section already landed can run "
                         "'--dtypes dpm' alone against the cached weights")
    ap.add_argument("--standard", action="store_true",
                    help="also run the full AA standard suite (APGD-CE/T, "
                         "FAB-T, Square) through the purifier")
    ap.add_argument("--large", action="store_true",
                    help="flagship-scale demo: the full CIFAR-config "
                         "NCSN++ (107M, nf=128 ch_mult=(1,2,2,2) 8 blocks) "
                         "trained in-env at 32x32 as the purifier")
    ap.add_argument("--hard", action="store_true",
                    help="harder distribution (8 classes, freq 4, lower "
                         "amplitude): de-saturates the defended number — "
                         "defended robust lands strictly between "
                         "undefended and clean")
    ap.add_argument("--sweep", default=None,
                    help="comma-separated t* values for the dose-response "
                         "sweep (e.g. '0,5,25,100'); runs white-box "
                         "APGD-EOT at each t* instead of the full protocol")
    ap.add_argument("--apgd_iter", type=int, default=None)
    ap.add_argument("--eot_iter", type=int, default=None)
    ap.add_argument("--n_eval", type=int, default=None)
    ap.add_argument("--aa_iter", type=int, default=None,
                    help="AA-standard-suite iteration budget "
                         "(default: apgd_iter)")
    ap.add_argument("--attacks", default=None,
                    help="comma list of protocol attacks to run "
                         "(apgd-eot,bpda,aa-standard); default: apgd-eot,"
                         "bpda[,aa-standard with --standard]. Lets a rerun "
                         "add one attack without repeating finished ones")
    ap.add_argument("--skip_accounting", action="store_true",
                    help="skip the defended clean/transfer vote accounting "
                         "(a resume leg rerunning only an attack subset "
                         "already has those numbers in the first leg's "
                         "artifact)")
    ap.add_argument("--aa_attacks", default=None,
                    help="comma subset of the AA standard suite "
                         "(apgd-ce,apgd-t,fab-t,square) to run via "
                         "version=custom — resume a crashed suite whose "
                         "finished attacks left the robust set unchanged")
    # distribution / threat-model overrides (take effect after --hard /
    # --large presets so a de-saturation point can be dialed in exactly)
    ap.add_argument("--eps", type=float, default=None)
    ap.add_argument("--amp_min", type=float, default=None)
    ap.add_argument("--amp_max", type=float, default=None)
    ap.add_argument("--noise_std", type=float, default=None)
    ap.add_argument("--freq", type=float, default=None)
    ap.add_argument("--size", type=int, default=None)
    ap.add_argument("--score_nf", type=int, default=None,
                    help="score-model width override (cheap probes of a "
                         "candidate regime before committing the flagship "
                         "training budget)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from diffpure_tpu.experiments import (DemoConfig, run_demo_protocol,
                                          run_dose_response,
                                          train_demo_classifier,
                                          train_demo_score)

    overrides = {"seed": args.seed}
    if args.hard:
        # de-saturated regime: 8 orientation bins at doubled spatial
        # frequency with low amplitude — t*=100 purification can no longer
        # restore the class signal perfectly, so defended accuracy leaves
        # the 100% ceiling and the protocol becomes dose-sensitive
        overrides.update(n_classes=8, freq=4.0, amp_min=0.15, amp_max=0.35,
                         noise_std=0.06, clf_steps=2000,
                         clf_train_size=1024, score_steps=4000)
    if args.large:
        # the flagship model (configs/cifar10.yml score net) on the 32x32
        # synthetic distribution; reduced attack budgets per compute cost
        overrides.update(
            size=32, score_nf=128, score_ch_mult=(1, 2, 2, 2),
            score_blocks=8, score_attn=(16,), score_steps=3000,
            score_batch=128, clf_width=64, clf_steps=1500,
            clf_train_size=1024, n_eval=32, eot_iter=3, apgd_iter=20,
            defense_reps=8, apgd_dispatch=1)
    if args.score_steps:
        overrides["score_steps"] = args.score_steps
    for k in ("apgd_iter", "eot_iter", "n_eval", "aa_iter", "eps",
              "amp_min", "amp_max", "noise_std", "freq", "size",
              "score_nf"):
        if getattr(args, k) is not None:
            overrides[k] = getattr(args, k)
    if args.aa_attacks:
        overrides["aa_attacks"] = tuple(
            a for a in args.aa_attacks.split(",") if a)
    if args.skip_accounting:
        overrides["skip_accounting"] = True
    cfg = DemoConfig(**overrides)
    print(f"config: {cfg}", flush=True)
    print(f"platform: {jax.devices()[0].platform} "
          f"({getattr(jax.devices()[0], 'device_kind', '?')})", flush=True)

    t0 = time.time()
    os.makedirs(args.out, exist_ok=True)
    cache = os.path.join(args.out, "trained_weights.pkl")
    # cache key: only the fields that affect TRAINING — attack budgets
    # (apgd_iter/eot_iter/n_eval/aa_iter/...) can change between runs that
    # reuse the same trained weights (e.g. the budget-increase rerun)
    train_fields = ("size", "n_classes", "amp_min", "amp_max", "freq",
                    "noise_std", "clf_width", "clf_steps", "clf_train_size",
                    "score_nf", "score_ch_mult", "score_blocks",
                    "score_attn", "score_steps", "score_batch", "score_lr",
                    "score_warmup", "ema_rate", "seed")
    from diffpure_tpu.experiments import DemoConfig as _DC
    _defaults = {k: getattr(_DC(), k) for k in train_fields}
    # caches written before a field existed carry its default implicitly
    train_key = lambda d: {k: d.get(k, _defaults[k])  # noqa: E731
                           for k in train_fields}
    if os.path.exists(cache):
        # resume a crashed protocol run without retraining (the models
        # rebuild deterministically from cfg; only params are cached)
        import pickle

        from diffpure_tpu.classifiers.small_cnn import SmallCNN
        from diffpure_tpu.models.ncsnpp import NCSNpp
        with open(cache, "rb") as f:
            blob = pickle.load(f)
        assert train_key(blob["config"]) == train_key(
            dataclasses.asdict(cfg)), \
            f"cache {cache} was trained under a different DemoConfig"
        clf = SmallCNN(n_classes=cfg.n_classes, width=cfg.clf_width)
        score_model = NCSNpp(
            image_size=cfg.size, nf=cfg.score_nf,
            ch_mult=cfg.score_ch_mult, num_res_blocks=cfg.score_blocks,
            attn_resolutions=cfg.score_attn, num_scales=1000, dropout=0.0)
        # device_put the pickled numpy params ONCE: closures over numpy
        # arrays re-upload them on every jit_lifted dispatch (~430 MB per
        # dispatch for the 107M score net on the tunneled backend — the
        # cause of the hard_aa leg's 129 GB host-OOM kill)
        clf_params = jax.device_put(blob["clf"])
        score_params = jax.device_put(blob["score"])
        print(f"loaded trained weights from {cache}", flush=True)
    else:
        clf, clf_params = train_demo_classifier(cfg)
        print(f"classifier trained ({time.time() - t0:.0f}s)", flush=True)

        score_model, score_params = train_demo_score(
            cfg, log=lambda s: print(s, flush=True))
        import pickle
        with open(cache, "wb") as f:
            pickle.dump({"config": dataclasses.asdict(cfg),
                         "clf": jax.device_get(clf_params),
                         "score": jax.device_get(score_params)}, f)
        print(f"trained weights cached to {cache}", flush=True)

    if args.sweep:
        t_values = tuple(int(v) for v in args.sweep.split(","))
        curve = run_dose_response(cfg, score_model, score_params, clf,
                                  clf_params, t_values=t_values,
                                  log=lambda s: print(s, flush=True))
        results = {"config": dataclasses.asdict(cfg),
                   "dose_response": curve}
    else:
        dtypes = ("sde", "dpm") if args.dpm else ("sde",)
        if args.dtypes:
            dtypes = tuple(a for a in args.dtypes.split(",") if a)
        if args.attacks is not None:
            attacks = [a for a in args.attacks.split(",") if a]
        else:
            attacks = ["apgd-eot", "bpda"]
            if args.standard:
                attacks.append("aa-standard")

        # persist partial results after every finished phase: attack
        # phases run 30-90 min each at flagship scale and two suite runs
        # have been lost whole to session deaths with nothing on disk
        def _write_partial(partial):
            blob = dict(partial)
            blob["partial"] = True
            blob["wall_s"] = round(time.time() - t0, 1)
            blob["platform"] = jax.devices()[0].platform
            with open(os.path.join(args.out, "results.json"), "w") as f:
                json.dump(blob, f, indent=2)

        results = run_demo_protocol(cfg, score_model, score_params, clf,
                                    clf_params, diffusion_types=dtypes,
                                    attacks=tuple(attacks),
                                    log=lambda s: print(s, flush=True),
                                    checkpoint=_write_partial)
    results["wall_s"] = round(time.time() - t0, 1)
    results["platform"] = jax.devices()[0].platform

    os.makedirs(args.out, exist_ok=True)
    fname = "dose_response.json" if args.sweep else "results.json"
    with open(os.path.join(args.out, fname), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps({k: v for k, v in results.items() if k != "config"},
                     indent=2))


if __name__ == "__main__":
    main()
