"""Perf probe: compare purify-throughput across implementation variants.

Run on the real chip; one process = one remote-compile cold start, then all
variants compile fast. Results guide the Pallas/fusion work.
"""
import time

import jax
import jax.numpy as jnp


def bench_purify(model, params, label, batch=64, t_star=100, n=3):
    from diffpure_tpu.purify import PurifyConfig, purify
    key = jax.random.PRNGKey(0)
    x_img = jax.random.uniform(key, (batch, 32, 32, 3)) * 2 - 1
    cfg = PurifyConfig(diffusion_type="sde", t=t_star,
                       score_type="score_sde", grad_mode="none")

    @jax.jit
    def run(params, x, k):
        return jnp.float32(purify(
            lambda p, xx, tt: model.apply(p, xx, tt), params, x, k,
            cfg).sum())

    t0 = time.time()
    float(run(params, x_img, jax.random.fold_in(key, 2)))
    print(f"[{label}] compile {time.time() - t0:.0f}s", flush=True)
    t0 = time.time()
    for i in range(n):
        float(run(params, x_img, jax.random.fold_in(key, 3 + i)))
    dt = (time.time() - t0) / n
    print(f"[{label}] {batch / dt:.1f} img/s/chip  {dt:.2f}s/batch  "
          f"{dt / t_star * 1000:.1f} ms/eval", flush=True)
    return batch / dt


def main():
    from diffpure_tpu.models.ncsnpp import NCSNpp
    key = jax.random.PRNGKey(0)
    params = NCSNpp().init(key, jnp.zeros((1, 32, 32, 3)), jnp.zeros((1,)))

    # 1. fp32 baseline
    bench_purify(NCSNpp(), params, "fp32")

    # 2. bf16 torso
    bench_purify(NCSNpp(dtype=jnp.bfloat16), params, "bf16")

    # 3. bf16 + native-dtype GroupNorm (no fp32 stat casts)
    import diffpure_tpu.ops.groupnorm as gn
    orig_gn = gn.group_norm

    def group_norm_fast(x, scale, bias, num_groups, eps=1e-6):
        N, H, W, C = x.shape
        xg = x.reshape(N, H, W, num_groups, C // num_groups)
        mean = jnp.mean(xg, axis=(1, 2, 4), keepdims=True)
        var = jnp.var(xg, axis=(1, 2, 4), keepdims=True)
        xg = (xg - mean) * jax.lax.rsqrt(var + eps)
        return (xg.reshape(N, H, W, C)
                * scale.astype(x.dtype).reshape(1, 1, 1, C)
                + bias.astype(x.dtype).reshape(1, 1, 1, C))

    import diffpure_tpu.models.layers as L
    gn.group_norm = group_norm_fast
    L.group_norm = group_norm_fast
    bench_purify(NCSNpp(dtype=jnp.bfloat16), params, "bf16+nativeGN")
    gn.group_norm = orig_gn
    L.group_norm = orig_gn

    # 4. bf16 batch 128
    bench_purify(NCSNpp(dtype=jnp.bfloat16), params, "bf16 b128", batch=128)


if __name__ == "__main__":
    main()
