"""Clean batch-size + solver sweep for the CIFAR purify bench."""
import time

import jax
import jax.numpy as jnp


def main():
    from diffpure_tpu.models.ncsnpp import NCSNpp
    from diffpure_tpu.purify import PurifyConfig, purify

    key = jax.random.PRNGKey(0)
    model = NCSNpp(dtype=jnp.bfloat16)
    params = model.init(key, jnp.zeros((1, 32, 32, 3)), jnp.zeros((1,)))

    def bench(cfg, batch, label, n=3):
        x = jax.random.uniform(key, (batch, 32, 32, 3)) * 2 - 1

        @jax.jit
        def run(params, xx, k):
            return jnp.float32(purify(
                lambda p, a, t: model.apply(p, a, t), params, xx, k,
                cfg).sum())

        t0 = time.time()
        float(run(params, x, jax.random.fold_in(key, 2)))
        c = time.time() - t0
        t0 = time.time()
        for i in range(n):
            float(run(params, x, jax.random.fold_in(key, 3 + i)))
        dt = (time.time() - t0) / n
        print(f"[{label}] compile {c:.0f}s  {batch / dt:.1f} img/s/chip  "
              f"{dt:.2f}s/batch", flush=True)

    sde = lambda: PurifyConfig(diffusion_type="sde", t=100,
                               score_type="score_sde", grad_mode="none")
    for b in [64, 128, 256, 512]:
        bench(sde(), b, f"sde t100 b{b}")
    # accelerated solver: 20 evals
    dpm = PurifyConfig(diffusion_type="dpm", t=100, n_steps=20,
                       score_type="score_sde", grad_mode="none")
    bench(dpm, 256, "dpm++2m 20-eval b256")


if __name__ == "__main__":
    main()
