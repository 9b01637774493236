"""shard_map serving wrapper: fused kernels on a multi-chip mesh.

pallas_call is opaque to XLA's SPMD partitioner; shard_defended_call runs
the defended step per-shard so the fused kernels see local batch tiles
(docs/PERF.md "Multi-chip note"). Validated on the 8-virtual-CPU mesh with
kernels in interpret mode.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffpure_tpu.models import layers as L
from diffpure_tpu.models.ncsnpp import NCSNpp
from diffpure_tpu.classifiers.wideresnet import WideResNet
from diffpure_tpu.parallel import make_mesh
from diffpure_tpu.parallel.serving import shard_defended_call
from diffpure_tpu.purify import PurifyConfig, purify


@pytest.fixture
def setup():
    model = NCSNpp(image_size=16, nf=32, ch_mult=(1, 2), num_res_blocks=1,
                   attn_resolutions=(8,), num_scales=100)
    key = jax.random.PRNGKey(0)
    params = model.init(key, jnp.zeros((1, 16, 16, 3)), jnp.zeros((1,)))
    clf = WideResNet(depth=10, widen_factor=1, normalize_input=False)
    clf_params = clf.init(jax.random.fold_in(key, 1),
                          jnp.zeros((1, 16, 16, 3)))
    cfg = PurifyConfig(diffusion_type="sde", t=3, score_type="score_sde",
                       grad_mode="none")

    def call(score_params, clf_params, x01, k):
        x = (x01 - 0.5) * 2.0
        xp = purify(lambda p, xx, tt: model.apply(p, xx, tt),
                    score_params, x, k, cfg)
        return clf.apply(clf_params, (xp + 1.0) * 0.5)

    x = jax.random.uniform(jax.random.fold_in(key, 2), (16, 16, 16, 3))
    return call, params, clf_params, x, key


def test_sharded_matches_per_shard_reference(setup):
    """The sharded call == manually chunked eager calls with the same
    per-shard key folding (unfused path — exact equality modulo fusion)."""
    call, params, clf_params, x, key = setup
    mesh = make_mesh(data=4, eot=2)
    fn = shard_defended_call(call, mesh)
    got = np.asarray(fn(params, clf_params, x, key))
    assert got.shape == (16, 10)

    n = mesh.size
    per = x.shape[0] // n
    want = np.concatenate([
        np.asarray(call(params, clf_params, x[i * per:(i + 1) * per],
                        jax.random.fold_in(key, i)))
        for i in range(n)])
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_shards_draw_distinct_noise(setup):
    """Identical inputs on every shard must still get distinct defense
    noise (the shard-index key fold)."""
    call, params, clf_params, x, key = setup
    mesh = make_mesh(data=4, eot=2)
    fn = shard_defended_call(call, mesh)
    x_same = jnp.tile(x[:2], (8, 1, 1, 1))  # same 2 examples on all shards
    logits = np.asarray(fn(params, clf_params, x_same, key))
    chunks = logits.reshape(8, 2, -1)
    diffs = [np.abs(chunks[i] - chunks[0]).max() for i in range(1, 8)]
    assert min(diffs) > 1e-6


def test_fused_kernels_run_under_shard_map(setup):
    """Force the fused path (interpret mode on CPU) under shard_map."""
    call, params, clf_params, x, key = setup
    mesh = make_mesh(data=4, eot=2)
    L.set_fused_resblock(True)
    try:
        fn = shard_defended_call(call, mesh)
        out = np.asarray(fn(params, clf_params, x, key))
    finally:
        L.set_fused_resblock("auto")
    assert out.shape == (16, 10)
    assert np.isfinite(out).all()
