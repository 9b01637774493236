"""ImageNet-256 white-box gradient path: hardware probe.

The reference's ImageNet AutoAttack protocol differentiates THROUGH the
552M ADM purifier over a t*=150 reverse VP-SDE (--diffusion_type sde with
the guided_diffusion score: ref run_scripts/imagenet/run_in_rand_inf.sh:15-24,
eval_sde_adv.py:103-110, runners/diffpure_sde.py:101-112,236-238). Until
round 4 this path had never been executed on hardware (only BPDA had).

Phases (each records compile time and OOM/watchdog outcomes):
  fwd   - one ADM-256 forward eval, halo on/off (the A/B baseline)
  bwd   - gradient of ONE ADM-256 eval wrt x, halo on/off: measures the
          cost of the halo block's unfused-XLA backward (ops/halo_conv.py
          custom_vjp) relative to its fused forward, full-model
          config-delta (isolated microbenches mislead on this backend)
  grad  - gradient of the FULL t*=150 sde purification (the attack
          gradient the protocol pays for; also audited by bench.py)
  apgd  - reduced-budget APGD-EOT through DefendedModel (ResNet-50,
          224<->256 resize, chunked dispatches): the protocol end-to-end

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/imagenet_grad_probe.py \
      --phases fwd,bwd,grad --batch 2
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


SMALL = False  # --small: tiny ADM on CPU (plumbing smoke, no chip)


def build_adm(batch):
    from diffpure_tpu.models.adm_unet import ADMUNet, imagenet256_config
    key = jax.random.PRNGKey(0)
    if SMALL:
        model = ADMUNet(image_size=8, model_channels=32, out_channels=6,
                        num_res_blocks=1, attention_resolutions=(2,),
                        channel_mult=(1, 2), num_heads=2,
                        num_head_channels=16)
        params = model.init(key, jnp.zeros((1, 8, 8, 3)),
                            jnp.zeros((1,), jnp.int32))
        x = jax.random.uniform(key, (batch, 8, 8, 3)) * 2 - 1
        return model, params, x, key
    model = ADMUNet(**imagenet256_config(use_bf16=True))
    params = jax.eval_shape(lambda: model.init(
        key, jnp.zeros((1, 256, 256, 3)), jnp.zeros((1,), jnp.int32)))
    # small random weights: zeros make SiLU/GN gradients degenerate
    params = jax.tree_util.tree_map(
        lambda s: jax.random.normal(
            jax.random.fold_in(key, (s.ndim * 1000 + s.shape[-1])),
            s.shape, s.dtype) * 0.02, params)
    x = jax.random.uniform(key, (batch, 256, 256, 3)) * 2 - 1
    return model, params, x, key


def _sync(v):
    return float(v)  # host fetch = the only reliable sync on this backend


def timed(fn, *args, iters=2):
    t0 = time.time()
    _sync(fn(*args))
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        _sync(fn(*args))
    return (time.time() - t0) / iters, compile_s


def phase_fwd_bwd(batch, do_bwd, out):
    from diffpure_tpu.models.adm_unet import set_halo_conv
    model, params, x, key = build_adm(batch)
    t = jnp.full((batch,), 120, jnp.int32)

    for halo in (True, False):
        set_halo_conv(halo)
        tag = "halo_on" if halo else "halo_off"

        fwd = jax.jit(lambda p, xx: jnp.float32(
            jnp.abs(model.apply(p, xx, t)).sum()))
        dt, cs = timed(fwd, params, x)
        out[f"fwd_{tag}_ms"] = round(dt * 1e3, 1)
        out[f"fwd_{tag}_compile_s"] = round(cs, 1)
        out[f"fwd_{tag}_abssum"] = _sync(fwd(params, x))
        print(f"fwd {tag}: {dt * 1e3:.1f} ms (compile {cs:.0f}s, "
              f"abssum {out[f'fwd_{tag}_abssum']:.4f})", flush=True)

        if do_bwd:
            bwd = jax.jit(lambda p, xx: jnp.float32(jnp.abs(jax.grad(
                lambda a: jnp.float32(model.apply(p, a, t).sum()))(
                    xx)).sum()))
            dt, cs = timed(bwd, params, x)
            out[f"gradeval_{tag}_ms"] = round(dt * 1e3, 1)
            out[f"gradeval_{tag}_compile_s"] = round(cs, 1)
            print(f"grad-of-eval {tag}: {dt * 1e3:.1f} ms "
                  f"(compile {cs:.0f}s)", flush=True)
    set_halo_conv(True)


def phase_grad(batch, t_star, out):
    from diffpure_tpu.purify import PurifyConfig, purify
    model, params, x, key = build_adm(batch)
    cfg = PurifyConfig(diffusion_type="sde", t=t_star,
                       score_type="guided_diffusion",
                       grad_mode="checkpoint")

    @jax.jit
    def run(p, xx, k):
        g = jax.grad(lambda a: jnp.float32(purify(
            lambda pp, b, tt: model.apply(pp, b, tt), p, a, k,
            cfg).sum()))(xx)
        return jnp.float32(jnp.abs(g).sum())

    dt, cs = timed(run, params, x, jax.random.fold_in(key, 7), iters=1)
    out["purify_grad_s"] = round(dt, 1)
    out["purify_grad_s_per_img"] = round(dt / batch, 2)
    out["purify_grad_compile_s"] = round(cs, 1)
    print(f"grad of t*={t_star} purify, B={batch}: {dt:.1f}s "
          f"({dt / batch:.1f} s/img; compile {cs:.0f}s)", flush=True)


def phase_apgd(batch, t_star, n_iter, eot, out):
    """Reduced-budget APGD-EOT with exact gradients through the purifier +
    the 224<->256 resize classifier wrapper — the rand protocol's shape."""
    from diffpure_tpu.attacks.apgd import APGDConfig, apgd_attack
    from diffpure_tpu.classifiers import get_classifier
    from diffpure_tpu.eval import DefendedModel
    from diffpure_tpu.purify import PurifyConfig

    model, params, x, key = build_adm(batch)
    clf, _translate, logits_fn = get_classifier("imagenet-resnet50")
    clf_params = clf.init(jax.random.PRNGKey(1),
                          jnp.zeros((1, 224, 224, 3)))
    cfg = PurifyConfig(diffusion_type="sde", t=t_star,
                       score_type="guided_diffusion",
                       grad_mode="checkpoint")
    defended = DefendedModel(
        score_model_fn=lambda p, a, tt: model.apply(p, a, tt),
        score_params=params, classifier_fn=logits_fn,
        classifier_params=clf_params, purify_cfg=cfg, resize_to=256)

    y = jnp.zeros((batch,), jnp.int32)
    # the protocol feeds classifier-sized (224px) images; DefendedModel
    # resizes 224->256 for purification and back (ref eval_sde_adv.py:64-76)
    x01 = jax.random.uniform(jax.random.fold_in(key, 9),
                             (batch, 224, 224, 3))
    if SMALL:  # tiny ADM is 8px: keep the resize path but at toy sizes
        defended.resize_to = 8
        x01 = jax.random.uniform(jax.random.fold_in(key, 9),
                                 (batch, 224, 224, 3))
    acfg = APGDConfig(norm="Linf", eps=0.0157, n_iter=n_iter,
                      eot_iter=eot, loss="ce", iters_per_dispatch=1)
    t0 = time.time()
    x_adv, _found = apgd_attack(defended, x01, y,
                                jax.random.fold_in(key, 3), acfg)
    wall = time.time() - t0
    delta = float(jnp.abs(x_adv - x01).max())
    out["apgd"] = {"n_iter": n_iter, "eot_iter": eot, "batch": batch,
                   "t_star": t_star, "wall_s": round(wall, 1),
                   "linf_delta": round(delta, 5)}
    print(f"APGD-EOT (iters {n_iter} x EOT {eot}, B={batch}, "
          f"t*={t_star}): {wall:.0f}s, linf(delta)={delta:.4f}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phases", default="fwd,bwd")
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--t", type=int, default=150)
    ap.add_argument("--apgd_iter", type=int, default=3)
    ap.add_argument("--eot_iter", type=int, default=2)
    ap.add_argument("--out", default="docs/imagenet_grad_probe.json")
    ap.add_argument("--small", action="store_true",
                    help="tiny ADM on CPU: plumbing smoke, no chip")
    args = ap.parse_args()
    if args.small:
        global SMALL
        SMALL = True
        jax.config.update("jax_platforms", "cpu")
    phases = args.phases.split(",")

    out = {"batch": args.batch, "t_star": args.t,
           "device": getattr(jax.devices()[0], "device_kind", "?")}
    if "fwd" in phases or "bwd" in phases:
        phase_fwd_bwd(args.batch, "bwd" in phases, out)
    if "grad" in phases:
        phase_grad(args.batch, args.t, out)
    if "apgd" in phases:
        phase_apgd(args.batch, args.t, args.apgd_iter, args.eot_iter, out)

    existing = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            existing = json.load(f)
    existing.update(out)
    with open(args.out, "w") as f:
        json.dump(existing, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
