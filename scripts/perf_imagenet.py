"""ImageNet-256 ADM purification throughput (t*=150 discrete guided loop)."""
import time

import jax
import jax.numpy as jnp


def main():
    from diffpure_tpu.models.adm_unet import ADMUNet, imagenet256_config
    from diffpure_tpu.purify import PurifyConfig, purify

    key = jax.random.PRNGKey(0)
    for batch in [8]:
        cfg_m = imagenet256_config(use_bf16=True)
        model = ADMUNet(**cfg_m)
        params = jax.eval_shape(lambda: model.init(
            key, jnp.zeros((1, 256, 256, 3)), jnp.zeros((1,), jnp.int32)))
        params = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), params)

        cfg = PurifyConfig(diffusion_type="ddpm", t=150,
                           score_type="guided_diffusion", grad_mode="none")
        x = jax.random.uniform(key, (batch, 256, 256, 3)) * 2 - 1

        @jax.jit
        def run(params, xx, k):
            return jnp.float32(purify(
                lambda p, a, t: model.apply(p, a, t), params, xx, k,
                cfg).sum())

        label = f"b{batch}"
        t0 = time.time()
        float(run(params, x, jax.random.fold_in(key, 2)))
        print(f"[{label}] compile {time.time() - t0:.0f}s", flush=True)
        t0 = time.time()
        n = 2
        for i in range(n):
            float(run(params, x, jax.random.fold_in(key, 3 + i)))
        dt = (time.time() - t0) / n
        print(f"[{label}] {batch / dt:.2f} img/s/chip  {dt:.1f}s/batch  "
              f"{dt / 150 * 1000:.0f} ms/eval", flush=True)


if __name__ == "__main__":
    main()
