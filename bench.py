"""Benchmark: purified images/sec/chip on the CIFAR-10 DiffPure config.

Measures the headline workload (BASELINE.md north star): full NCSN++
(107M params, configs/cifar10.yml) reverse VP-SDE purification with t*=100
Euler-Maruyama steps (= 100 UNet evals per image), batch 128, on whatever
accelerator jax provides. Prints ONE JSON line.

vs_baseline: the reference publishes no numbers (BASELINE.md); the paper-era
single-V100 throughput for this exact config is ~10 purified images/s
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

BATCH = 128
T_STAR = 100

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


def main():
    from diffpure_tpu.models.ncsnpp import NCSNpp
    from diffpure_tpu.purify import PurifyConfig, purify

    model = NCSNpp(dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    x_img = jax.random.uniform(key, (BATCH, 32, 32, 3)) * 2 - 1
    params = model.init(jax.random.fold_in(key, 1),
                        jnp.zeros((1, 32, 32, 3)), jnp.zeros((1,)))

    cfg = PurifyConfig(diffusion_type="sde", t=T_STAR,
                       score_type="score_sde", grad_mode="none")

    @jax.jit
    def run(params, x, k):
        out = purify(lambda p, xx, tt: model.apply(p, xx, tt),
                     params, x, k, cfg)
        # scalar checksum: forces the full computation; the tiny host fetch
        # is the only reliable sync on remote-execution backends where
        # block_until_ready returns before the work drains.
        return jnp.float32(out.sum())

    # Model FLOPs per UNet eval for the mfu field. The measured constant
    # for this exact fixed config (full CIFAR NCSN++, B=128) from XLA cost
    # analysis of the UNFUSED graph — cost analysis reports 0 for Pallas
    # custom calls, and recompiling the unfused model just to count FLOPs
    # costs ~5 min of remote compile per bench run (docs/PERF.md documents
    # the derivation: 34.70 GFLOP/img/eval).
    flops_per_eval = 34.70e9 * BATCH

    # compile + warmup (absorbs the remote-compile cold start)
    t0 = time.time()
    float(run(params, x_img, jax.random.fold_in(key, 2)))
    compile_s = time.time() - t0

    n_iters = 2
    t0 = time.time()
    for i in range(n_iters):
        float(run(params, x_img, jax.random.fold_in(key, 3 + i)))
    dt = (time.time() - t0) / n_iters

    n_chips = jax.device_count()
    imgs_per_sec_chip = BATCH / dt / n_chips
    out = {
        "metric": "purified_images_per_sec_per_chip",
        "value": round(imgs_per_sec_chip, 3),
        "unit": f"img/s/chip (CIFAR-10 NCSN++ bf16 t*={T_STAR}, "
                f"batch {BATCH})",
        "vs_baseline": round(imgs_per_sec_chip / REFERENCE_IMGS_PER_SEC_V100,
                             3),
        "ms_per_unet_eval": round(dt / T_STAR * 1e3, 2),
        "compile_s": round(compile_s, 1),
    }
    if flops_per_eval:
        tflops = flops_per_eval * T_STAR / dt / 1e12 / n_chips
        out["model_tflops_per_s"] = round(tflops, 1)
        out["mfu"] = round(tflops / _peak_tflops(), 3)
        out["gflop_per_img_per_eval"] = round(flops_per_eval / BATCH / 1e9, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
