"""Benchmark: purified images/sec/chip on the CIFAR-10 DiffPure config.

Measures the headline workload (BASELINE.md north star): full NCSN++
(107M params, configs/cifar10.yml) reverse VP-SDE purification with t*=100
Euler-Maruyama steps (= 100 UNet evals per image), batch 64, on whatever
accelerator jax provides. Prints ONE JSON line.

vs_baseline: the reference publishes no numbers (BASELINE.md); the paper-era
single-V100 throughput for this exact config is ~10 purified images/s
(batch 64 / ~6s per batch, torch fp16-less eager) — used as the documented
denominator. Re-derive on real reference hardware when available.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

REFERENCE_IMGS_PER_SEC_V100 = 10.0

BATCH = 128
T_STAR = 100


def main():
    from diffpure_tpu.models.ncsnpp import NCSNpp
    from diffpure_tpu.purify import PurifyConfig, purify

    import jax.numpy as _jnp
    model = NCSNpp(dtype=_jnp.bfloat16)
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

    # compile + warmup (absorbs the remote-compile cold start)
    float(run(params, x_img, jax.random.fold_in(key, 2)))

    n_iters = 2
    t0 = time.time()
    for i in range(n_iters):
        float(run(params, x_img, jax.random.fold_in(key, 3 + i)))
    dt = (time.time() - t0) / n_iters

    n_chips = jax.device_count()
    imgs_per_sec_chip = BATCH / dt / n_chips
    print(json.dumps({
        "metric": "purified_images_per_sec_per_chip",
        "value": round(imgs_per_sec_chip, 3),
        "unit": f"img/s/chip (CIFAR-10 NCSN++ bf16 t*={T_STAR}, batch {BATCH})",
        "vs_baseline": round(imgs_per_sec_chip / REFERENCE_IMGS_PER_SEC_V100,
                             3),
    }))


if __name__ == "__main__":
    main()
