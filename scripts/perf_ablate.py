"""Component ablation: where does the NCSN++ eval time go?

Times the purify scan with parts of the model disabled. Differences
attribute cost to attention / GroupNorm / res-block depth.
"""
import time

import jax
import jax.numpy as jnp


def bench(model, params, label, batch=128, t_star=50, n=3):
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
    compile_s = time.time() - t0
    t0 = time.time()
    for i in range(n):
        float(run(params, x_img, jax.random.fold_in(key, 3 + i)))
    dt = (time.time() - t0) / n
    print(f"[{label}] compile {compile_s:.0f}s  "
          f"{dt / t_star * 1000:.2f} ms/eval (b{batch})", flush=True)


def main():
    import flax.linen as nn
    import diffpure_tpu.models.layers as L
    from diffpure_tpu.models.ncsnpp import NCSNpp

    key = jax.random.PRNGKey(0)

    def make(label, **kw):
        m = NCSNpp(dtype=jnp.bfloat16, **kw)
        p = m.init(key, jnp.zeros((1, 32, 32, 3)), jnp.zeros((1,)))
        return m, p

    # baseline
    m, p = make("full")
    bench(m, p, "full")

    # no attention (attn at a resolution that never occurs)
    m2, p2 = make("noattn", attn_resolutions=(1,))
    bench(m2, p2, "no-attention")

    # half depth
    m3, p3 = make("half", num_res_blocks=4)
    bench(m3, p3, "4-res-blocks")

    # GroupNorm -> identity (cost attribution only)
    orig = L.GroupNormTorch.__call__

    def identity_gn(self, x):
        C = x.shape[-1]
        self.param("scale", nn.initializers.ones, (C,))
        self.param("bias", nn.initializers.zeros, (C,))
        return x

    L.GroupNormTorch.__call__ = identity_gn
    m4, p4 = make("nogn")
    bench(m4, p4, "no-groupnorm")
    L.GroupNormTorch.__call__ = orig

    # swish -> identity
    m5, p5 = make("full2")
    import diffpure_tpu.models.ncsnpp as NC
    bench(m5, p5, "full-again-sanity")


if __name__ == "__main__":
    main()
