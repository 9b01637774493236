"""Benchmark: purified images/sec/chip across the headline workloads.

Headline (BASELINE.md north star): full NCSN++ (107M params,
configs/cifar10.yml) reverse VP-SDE purification with t*=100 Euler-Maruyama
steps (= 100 UNet evals per image), batch 128, bf16. Prints ONE JSON line;
the secondary workloads (accelerated CIFAR DPM-Solver++@20 and the
ImageNet-256 ADM t*=150 discrete loop — the other axis of the north-star
metric) are audited in the same line under "workloads".

vs_baseline: the reference publishes no numbers (BASELINE.md); the paper-era
single-V100 throughput for the headline config is ~10 purified images/s
(batch 128-equivalent, torch eager) — used as the documented denominator.
Re-derive on real reference hardware when available.

mfu: measured model FLOPs (XLA cost analysis of one UNet eval x 100 steps)
over the chip's bf16 peak — see docs/PERF.md for the roofline analysis
(Euler-100 has a hard single-chip ceiling of peak/3.47TFLOP-per-image).
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

REFERENCE_IMGS_PER_SEC_V100 = 10.0

# ImageNet-256 denominator (the north star's second axis, BASELINE.json):
# paper-era torch-eager V100 estimate for the reference ADM purification
# (t*=150 x 2.39 TFLOP/img/eval = 358 TFLOP per purified image; fp16
# torso on V100 at the ~30% eager MFU the CIFAR denominator assumes
# -> ~9.6 s/img, i.e. ~0.10 img/s per V100 at the protocol's batch 4).
# Derivation + HBM cross-check in BASELINE.md / docs/PERF.md; re-derive
# on real reference hardware when available.
ADM_REFERENCE_IMGS_PER_SEC_V100 = 0.10

BATCH = 128
T_STAR = 100

# Model FLOPs per image per UNet eval for the informational mfu field,
# measured once via XLA cost analysis of the UNFUSED graph (cost analysis
# reports 0 for Pallas custom calls; docs/PERF.md documents the derivation).
# Valid ONLY for the exact configs whose param counts are asserted below —
# a config drift fails the bench loudly instead of silently faking MFU.
CIFAR_GFLOP_PER_IMG_EVAL = 34.70
CIFAR_EXPECTED_PARAMS = 106_632_579  # NCSNpp() CIFAR config
ADM_EXPECTED_PARAMS = 552_814_086    # imagenet256_config(use_bf16=True)

ADM_BATCH = 8
ADM_T_STAR = 150
DPM_STEPS = 20

# bf16 peak of the benched chip family (TPU v5e ~197 TFLOP/s). Only used
# for the informational mfu field; throughput is measured.
PEAK_BF16_TFLOPS = {"v5 lite": 197.0, "v5e": 197.0, "v4": 275.0,
                    "v5p": 459.0, "v6e": 918.0}


def _peak_tflops() -> float:
    kind = getattr(jax.devices()[0], "device_kind", "").lower()
    for k, v in PEAK_BF16_TFLOPS.items():
        if k in kind:
            return v
    return 197.0


def _param_count(params) -> int:
    import numpy as np
    return sum(int(np.prod(v.shape))
               for v in jax.tree_util.tree_leaves(params))


def _timed(run, params, x, key, n_iters=2):
    """(mean seconds per call, compile seconds). The float() host fetch is
    the only reliable sync on remote-execution backends where
    block_until_ready returns before the work drains."""
    t0 = time.time()
    float(run(params, x, jax.random.fold_in(key, 2)))
    compile_s = time.time() - t0
    t0 = time.time()
    for i in range(n_iters):
        float(run(params, x, jax.random.fold_in(key, 3 + i)))
    return (time.time() - t0) / n_iters, compile_s


def bench_cifar(n_steps=None, tag="euler"):
    """CIFAR NCSN++ reverse-SDE (Euler t* steps) or DPM-Solver++(2M)."""
    from diffpure_tpu.models.ncsnpp import NCSNpp
    from diffpure_tpu.purify import PurifyConfig, purify

    model = NCSNpp(dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    x_img = jax.random.uniform(key, (BATCH, 32, 32, 3)) * 2 - 1
    params = model.init(jax.random.fold_in(key, 1),
                        jnp.zeros((1, 32, 32, 3)), jnp.zeros((1,)))
    n_params = _param_count(params)
    assert n_params == CIFAR_EXPECTED_PARAMS, (
        f"benched NCSN++ has {n_params} params != the config the "
        f"{CIFAR_GFLOP_PER_IMG_EVAL} GFLOP constant was derived for")

    if tag == "euler":
        cfg = PurifyConfig(diffusion_type="sde", t=T_STAR,
                           score_type="score_sde", grad_mode="none")
        nfe = T_STAR
    else:
        cfg = PurifyConfig(diffusion_type="dpm", t=T_STAR,
                           n_steps=n_steps, score_type="score_sde",
                           grad_mode="none")
        nfe = n_steps

    @jax.jit
    def run(params, x, k):
        out = purify(lambda p, xx, tt: model.apply(p, xx, tt),
                     params, x, k, cfg)
        return jnp.float32(out.sum())

    dt, compile_s = _timed(run, params, x_img, key)
    return dt, compile_s, nfe


def bench_adm256():
    """ImageNet-256 ADM t*=150 discrete guided loop (ref diffpure_guided)."""
    from diffpure_tpu.models.adm_unet import ADMUNet, imagenet256_config
    from diffpure_tpu.purify import PurifyConfig, purify

    key = jax.random.PRNGKey(0)
    model = ADMUNet(**imagenet256_config(use_bf16=True))
    params = jax.eval_shape(lambda: model.init(
        key, jnp.zeros((1, 256, 256, 3)), jnp.zeros((1,), jnp.int32)))
    params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), params)
    n_params = _param_count(params)
    assert n_params == ADM_EXPECTED_PARAMS, (
        f"benched ADM UNet has {n_params} params != imagenet256_config")

    cfg = PurifyConfig(diffusion_type="ddpm", t=ADM_T_STAR,
                       score_type="guided_diffusion", grad_mode="none")
    x = jax.random.uniform(key, (ADM_BATCH, 256, 256, 3)) * 2 - 1

    @jax.jit
    def run(params, xx, k):
        return jnp.float32(purify(
            lambda p, a, t: model.apply(p, a, t), params, xx, k, cfg).sum())

    dt, compile_s = _timed(run, params, x, key)
    return dt, compile_s


ADM_DDIM_RESPACE = 50  # ddim50: 50-step respacing of the 1000-step process
ADM_DDIM_T = 8         # respaced index ~ t*=150/1000*50 (abar-matched depth)


def bench_adm256_ddim():
    """Accelerated ImageNet-256 purification: ddim50 respacing + DDIM
    updates (ref respace.py:71-135, gaussian_diffusion.py:545-612) — the
    discrete-path NFE reduction analogous to DPM++ on the continuous path
    (docs/PERF.md: the route past the ADM-256 single-chip roofline).
    Forward-noise depth: respaced index 8 maps to original step ~160,
    abar-matched to the reference's t*=150."""
    from diffpure_tpu.models.adm_unet import ADMUNet, imagenet256_config
    from diffpure_tpu.purify import PurifyConfig, purify
    from diffpure_tpu.purify.runners import make_imagenet_diffusion

    key = jax.random.PRNGKey(0)
    model = ADMUNet(**imagenet256_config(use_bf16=True))
    params = jax.eval_shape(lambda: model.init(
        key, jnp.zeros((1, 256, 256, 3)), jnp.zeros((1,), jnp.int32)))
    params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), params)
    diffusion = make_imagenet_diffusion(f"ddim{ADM_DDIM_RESPACE}")
    cfg = PurifyConfig(diffusion_type="ddpm", t=ADM_DDIM_T,
                       score_type="guided_diffusion", grad_mode="none")
    x = jax.random.uniform(key, (ADM_BATCH, 256, 256, 3)) * 2 - 1

    @jax.jit
    def run(params, xx, k):
        return jnp.float32(purify(
            lambda p, a, t: model.apply(p, a, t), params, xx, k, cfg,
            diffusion=diffusion, use_ddim=True).sum())

    dt, compile_s = _timed(run, params, x, key)
    return dt, compile_s


ADM_GRAD_BATCH = 2
ADM_GRAD_T_STAR = 150


def bench_adm256_grad():
    """White-box gradient through the ImageNet-256 purifier — the
    reference's actual ImageNet AutoAttack protocol: --diffusion_type sde
    with the guided_diffusion score, APGD-EOT gradients THROUGH the 552M
    ADM over a t*=150 reverse VP-SDE (ref run_scripts/imagenet/
    run_in_rand_inf.sh:15-24, eval_sde_adv.py:103-110,
    runners/diffpure_sde.py:101-112,236-238). Checkpoint-exact backprop
    through all 150 remat'd evals at 256x256, bf16."""
    from diffpure_tpu.models.adm_unet import ADMUNet, imagenet256_config
    from diffpure_tpu.purify import PurifyConfig, purify

    key = jax.random.PRNGKey(0)
    model = ADMUNet(**imagenet256_config(use_bf16=True))
    params = jax.eval_shape(lambda: model.init(
        key, jnp.zeros((1, 256, 256, 3)), jnp.zeros((1,), jnp.int32)))
    params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), params)
    n_params = _param_count(params)
    assert n_params == ADM_EXPECTED_PARAMS, (
        f"benched ADM UNet has {n_params} params != imagenet256_config")

    cfg = PurifyConfig(diffusion_type="sde", t=ADM_GRAD_T_STAR,
                       score_type="guided_diffusion",
                       grad_mode="checkpoint")
    x = jax.random.uniform(key, (ADM_GRAD_BATCH, 256, 256, 3)) * 2 - 1

    @jax.jit
    def run(params, xx, k):
        g = jax.grad(lambda a: jnp.float32(purify(
            lambda p, b, t: model.apply(p, b, t), params, a, k,
            cfg).sum()))(xx)
        return jnp.float32(jnp.abs(g).sum())

    return _timed(run, params, x, key, n_iters=1)


def bench_adm256_ddim_grad():
    """White-box gradient through the ACCELERATED ImageNet-256 purifier:
    ddim50 respacing (8 respaced steps, abar-matched to t*=150) with
    checkpoint-exact backprop — the practical 256px attack route
    (ref respace.py:71-135; grad correctness unit-tested in
    tests/test_purify.py's respaced-DDIM grad test). The full t*=150
    gradient costs ~14.7 s/img (imagenet256_grad_of_purify_t150); this
    route pays 8 evals + 8 recomputes instead of 150+150."""
    from diffpure_tpu.models.adm_unet import ADMUNet, imagenet256_config
    from diffpure_tpu.purify import PurifyConfig, purify
    from diffpure_tpu.purify.runners import make_imagenet_diffusion

    key = jax.random.PRNGKey(0)
    model = ADMUNet(**imagenet256_config(use_bf16=True))
    params = jax.eval_shape(lambda: model.init(
        key, jnp.zeros((1, 256, 256, 3)), jnp.zeros((1,), jnp.int32)))
    params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), params)
    diffusion = make_imagenet_diffusion(f"ddim{ADM_DDIM_RESPACE}")
    cfg = PurifyConfig(diffusion_type="ddpm", t=ADM_DDIM_T,
                       score_type="guided_diffusion",
                       grad_mode="checkpoint")
    x = jax.random.uniform(key, (ADM_GRAD_BATCH, 256, 256, 3)) * 2 - 1

    @jax.jit
    def run(params, xx, k):
        g = jax.grad(lambda a: jnp.float32(purify(
            lambda p, b, t: model.apply(p, b, t), params, a, k, cfg,
            diffusion=diffusion, use_ddim=True).sum()))(xx)
        return jnp.float32(jnp.abs(g).sum())

    return _timed(run, params, x, key, n_iters=1)


GRAD_BATCH = 16


def bench_cifar_grad():
    """Gradient through the full purifier (the attack path — what AA/BPDA
    chip-hours actually pay for; docs/GRADIENTS.md): grad of sum(purify)
    at t*=100 via checkpoint-exact backprop, bf16, batch 16. Round 3's
    fused Pallas backward kernels serve the dx path."""
    from diffpure_tpu.models.ncsnpp import NCSNpp
    from diffpure_tpu.purify import PurifyConfig, purify

    model = NCSNpp(dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    x_img = jax.random.uniform(key, (GRAD_BATCH, 32, 32, 3)) * 2 - 1
    params = model.init(jax.random.fold_in(key, 1),
                        jnp.zeros((1, 32, 32, 3)), jnp.zeros((1,)))
    cfg = PurifyConfig(diffusion_type="sde", t=T_STAR,
                       score_type="score_sde", grad_mode="checkpoint")

    @jax.jit
    def run(params, x, k):
        g = jax.grad(lambda xx: jnp.float32(purify(
            lambda p, a, t: model.apply(p, a, t), params, xx, k,
            cfg).sum()))(x)
        return jnp.float32(jnp.abs(g).sum())

    return _timed(run, params, x_img, key)


CELEBA_BATCH = 2
CELEBA_T_STAR = 50  # ms/eval is what matters; the protocol runs t*=500
# XLA cost analysis of one DDPM-UNet-256 eval at batch 1 (same derivation
# as CIFAR_GFLOP_PER_IMG_EVAL); the baseline denominator applies the
# BASELINE.md convention — torch-eager V100 at ~30% of fp16 peak
# (125 TFLOP/s -> 37.5 sustained), i.e. 497.78 / 37.5 = 13.27 ms/img-eval
CELEBA_GFLOP_PER_IMG_EVAL = 497.78
CELEBA_V100_MS_PER_IMG_EVAL = CELEBA_GFLOP_PER_IMG_EVAL / 37.5


def bench_celebahq():
    """CelebA-HQ SDEdit DDPM-256 discrete loop (bf16 serving config)."""
    from diffpure_tpu.models.ddpm_unet import DDPMUNet
    from diffpure_tpu.purify import PurifyConfig, purify

    key = jax.random.PRNGKey(0)
    model = DDPMUNet(dtype=jnp.bfloat16)
    params = jax.eval_shape(lambda: model.init(
        key, jnp.zeros((1, 256, 256, 3)), jnp.zeros((1,), jnp.int32)))
    params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), params)
    cfg = PurifyConfig(diffusion_type="celebahq-ddpm", t=CELEBA_T_STAR,
                       score_type="guided_diffusion", learn_sigma=False,
                       grad_mode="none")
    x = jax.random.uniform(key, (CELEBA_BATCH, 256, 256, 3)) * 2 - 1

    @jax.jit
    def run(params, xx, k):
        return jnp.float32(purify(
            lambda p, a, t: model.apply(p, a, t), params, xx, k, cfg).sum())

    return _timed(run, params, x, key)


def main():
    # `--only <substring>` runs just the matching secondary workload(s)
    # (skipping the headline) — lets the hardware queue measure one
    # workload without paying for the full suite. Default: everything.
    import sys
    only = None
    if "--only" in sys.argv:
        only = sys.argv[sys.argv.index("--only") + 1]

    def want(name: str) -> bool:
        return only is None or only in name

    n_chips = jax.device_count()
    peak = _peak_tflops()

    # --- headline: CIFAR Euler-100 --------------------------------------
    if only is None:
        dt, compile_s, nfe = bench_cifar(tag="euler")
        imgs_per_sec_chip = BATCH / dt / n_chips
        tflops = CIFAR_GFLOP_PER_IMG_EVAL * BATCH * nfe / dt / 1e3 / n_chips
        out = {
            "metric": "purified_images_per_sec_per_chip",
            "value": round(imgs_per_sec_chip, 3),
            "unit": f"img/s/chip (CIFAR-10 NCSN++ bf16 t*={T_STAR}, "
                    f"batch {BATCH})",
            "vs_baseline": round(
                imgs_per_sec_chip / REFERENCE_IMGS_PER_SEC_V100, 3),
            "ms_per_unet_eval": round(dt / nfe * 1e3, 2),
            "compile_s": round(compile_s, 1),
            "model_tflops_per_s": round(tflops, 1),
            "mfu": round(tflops / peak, 3),
            "gflop_per_img_per_eval": CIFAR_GFLOP_PER_IMG_EVAL,
        }
    else:
        out = {"metric": f"only:{only}", "value": None, "unit": "partial",
               "vs_baseline": None}

    workloads = {}

    # --- CIFAR DPM-Solver++(2M) @ 20 NFE (accelerated purification) -----
    if want("cifar_dpmpp_20nfe"):
        try:
            dt, compile_s, nfe = bench_cifar(n_steps=DPM_STEPS, tag="dpm")
            workloads["cifar_dpmpp_20nfe"] = {
                "img_per_sec_per_chip": round(BATCH / dt / n_chips, 1),
                "vs_baseline": round(BATCH / dt / n_chips
                                     / REFERENCE_IMGS_PER_SEC_V100, 2),
                "ms_per_unet_eval": round(dt / nfe * 1e3, 2),
                "compile_s": round(compile_s, 1),
            }
        except Exception as e:  # secondary workloads must not kill the headline
            workloads["cifar_dpmpp_20nfe"] = {"error": repr(e)[:200]}

    # --- gradient through purify (the attack path, docs/GRADIENTS.md) ---
    if want("cifar_grad_of_purify_t100"):
        try:
            dt, compile_s = bench_cifar_grad()
            workloads["cifar_grad_of_purify_t100"] = {
                "grad_img_per_sec_per_chip": round(GRAD_BATCH / dt / n_chips, 2),
                "s_per_grad_img": round(dt / GRAD_BATCH, 4),
                "batch": GRAD_BATCH,
                "compile_s": round(compile_s, 1),
            }
        except Exception as e:
            workloads["cifar_grad_of_purify_t100"] = {"error": repr(e)[:200]}

    # --- ImageNet-256 ADM t*=150 (the north-star's second axis) ---------
    if want("imagenet256_adm_t150"):
        try:
            dt, compile_s = bench_adm256()
            workloads["imagenet256_adm_t150"] = {
                "img_per_sec_per_chip": round(ADM_BATCH / dt / n_chips, 3),
                "vs_baseline": round(ADM_BATCH / dt / n_chips
                                     / ADM_REFERENCE_IMGS_PER_SEC_V100, 2),
                "ms_per_unet_eval": round(dt / ADM_T_STAR * 1e3, 1),
                "batch": ADM_BATCH,
                "compile_s": round(compile_s, 1),
            }
        except Exception as e:
            workloads["imagenet256_adm_t150"] = {"error": repr(e)[:200]}

    # --- ImageNet-256 accelerated purification (ddim50 respacing) -------
    if want("imagenet256_ddim50_t8"):
        try:
            dt, compile_s = bench_adm256_ddim()
            workloads["imagenet256_ddim50_t8"] = {
                "img_per_sec_per_chip": round(ADM_BATCH / dt / n_chips, 3),
                "vs_baseline": round(ADM_BATCH / dt / n_chips
                                     / ADM_REFERENCE_IMGS_PER_SEC_V100, 2),
                "nfe": ADM_DDIM_T,
                "batch": ADM_BATCH,
                "compile_s": round(compile_s, 1),
            }
        except Exception as e:
            workloads["imagenet256_ddim50_t8"] = {"error": repr(e)[:200]}

    # --- ImageNet-256 white-box gradient (the reference ImageNet AA path)
    if want("imagenet256_grad_of_purify_t150"):
        try:
            dt, compile_s = bench_adm256_grad()
            workloads["imagenet256_grad_of_purify_t150"] = {
                "s_per_grad_img": round(dt / ADM_GRAD_BATCH, 2),
                "grad_img_per_sec_per_chip": round(
                    ADM_GRAD_BATCH / dt / n_chips, 4),
                "batch": ADM_GRAD_BATCH,
                "compile_s": round(compile_s, 1),
            }
        except Exception as e:
            workloads["imagenet256_grad_of_purify_t150"] = {"error": repr(e)[:200]}

    # --- ImageNet-256 accelerated white-box gradient (ddim50 respacing) -
    if want("imagenet256_ddim50_grad"):
        try:
            dt, compile_s = bench_adm256_ddim_grad()
            workloads["imagenet256_ddim50_grad"] = {
                "s_per_grad_img": round(dt / ADM_GRAD_BATCH, 3),
                "grad_img_per_sec_per_chip": round(
                    ADM_GRAD_BATCH / dt / n_chips, 3),
                "nfe": ADM_DDIM_T,
                "batch": ADM_GRAD_BATCH,
                "compile_s": round(compile_s, 1),
            }
        except Exception as e:
            workloads["imagenet256_ddim50_grad"] = {"error": repr(e)[:200]}

    # --- CelebA-HQ DDPM-256 (the t*=500 BPDA protocol's UNet) -----------
    if want("celebahq_ddpm256_bf16"):
        try:
            dt, compile_s = bench_celebahq()
            ms_eval = dt / CELEBA_T_STAR * 1e3
            workloads["celebahq_ddpm256_bf16"] = {
                "ms_per_unet_eval": round(ms_eval, 2),
                "vs_baseline": round(
                    CELEBA_V100_MS_PER_IMG_EVAL
                    / (ms_eval / CELEBA_BATCH), 2),
                "batch": CELEBA_BATCH,
                "compile_s": round(compile_s, 1),
            }
        except Exception as e:
            workloads["celebahq_ddpm256_bf16"] = {"error": repr(e)[:200]}

    out["workloads"] = workloads
    print(json.dumps(out))


if __name__ == "__main__":
    main()
