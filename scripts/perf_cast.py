"""Param-dtype probe: fp32 params (cast per use) vs pre-cast bf16 params."""
import time

import jax
import jax.numpy as jnp


def bench(params, label, batch=128, t_star=100, n=2):
    from diffpure_tpu.models.ncsnpp import NCSNpp
    from diffpure_tpu.purify import PurifyConfig, purify
    model = NCSNpp(dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    cfg = PurifyConfig(diffusion_type="sde", t=t_star,
                       score_type="score_sde", grad_mode="none")
    x = jax.random.uniform(key, (batch, 32, 32, 3)) * 2 - 1

    @jax.jit
    def run(params, xx, k):
        return jnp.float32(purify(
            lambda p, a, t: model.apply(p, a, t), params, xx, k, cfg).sum())

    t0 = time.time()
    float(run(params, x, jax.random.fold_in(key, 2)))
    c = time.time() - t0
    t0 = time.time()
    for i in range(n):
        float(run(params, x, jax.random.fold_in(key, 3 + i)))
    dt = (time.time() - t0) / n
    print(f"[{label}] compile {c:.0f}s  {batch / dt:.1f} img/s/chip",
          flush=True)


def main():
    from diffpure_tpu.models.ncsnpp import NCSNpp
    key = jax.random.PRNGKey(0)
    params = NCSNpp().init(key, jnp.zeros((1, 32, 32, 3)), jnp.zeros((1,)))
    bench(params, "fp32 params")
    params_bf = jax.tree_util.tree_map(
        lambda v: v.astype(jnp.bfloat16), params)
    bench(params_bf, "bf16 params")


if __name__ == "__main__":
    main()
