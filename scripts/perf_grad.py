"""Gradient-path throughput: the attack workload (grad through purify)."""
import time

import jax
import jax.numpy as jnp


def main():
    from diffpure_tpu.models.ncsnpp import NCSNpp
    from diffpure_tpu.purify import PurifyConfig, purify

    key = jax.random.PRNGKey(0)
    model = NCSNpp(dtype=jnp.bfloat16)
    params = model.init(key, jnp.zeros((1, 32, 32, 3)), jnp.zeros((1,)))

    for mode, batch, t_star in [("checkpoint", 32, 100),
                                ("adjoint", 32, 100)]:
        cfg = PurifyConfig(diffusion_type="sde", t=t_star,
                           score_type="score_sde", grad_mode=mode)
        x_img = jax.random.uniform(key, (batch, 32, 32, 3)) * 2 - 1

        @jax.jit
        def gradstep(params, x, k):
            def loss(xx):
                out = purify(lambda p, a, t: model.apply(p, a, t),
                             params, xx, k, cfg)
                return jnp.float32((out ** 2).sum())
            l, g = jax.value_and_grad(loss)(x)
            return l + jnp.float32(g.sum())

        t0 = time.time()
        float(gradstep(params, x_img, jax.random.fold_in(key, 2)))
        print(f"[{mode}] compile {time.time() - t0:.0f}s", flush=True)
        t0 = time.time()
        n = 3
        for i in range(n):
            float(gradstep(params, x_img, jax.random.fold_in(key, 3 + i)))
        dt = (time.time() - t0) / n
        print(f"[{mode}] {batch / dt:.2f} grad-img/s  {dt:.2f}s/batch "
              f"(b{batch}, t*={t_star})", flush=True)


if __name__ == "__main__":
    main()
