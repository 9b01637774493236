"""Sharding tests on the virtual 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from diffpure_tpu.parallel import (
    make_mesh, shard_batch, replicate, eot_fold, eot_unfold,
)
from diffpure_tpu.purify import PurifyConfig, purify


def test_device_count():
    assert len(jax.devices()) == 8


class TestMesh:
    def test_make_mesh_shapes(self):
        m = make_mesh()
        assert m.shape == {"data": 8, "eot": 1}
        m2 = make_mesh(data=4, eot=2)
        assert m2.shape == {"data": 4, "eot": 2}
        m3 = make_mesh(eot=4)
        assert m3.shape == {"data": 2, "eot": 4}

    def test_shard_batch_and_replicate(self):
        mesh = make_mesh(data=8)
        x = jnp.arange(8 * 4.0).reshape(8, 4)
        xs = shard_batch(x, mesh)
        assert xs.sharding.spec == P("data")
        params = {"w": jnp.ones((3, 3))}
        pr = replicate(params, mesh)
        assert pr["w"].sharding.is_fully_replicated

    def test_eot_fold_unfold(self):
        x = jnp.arange(2 * 3.0).reshape(2, 3)
        f = eot_fold(x, 4)
        assert f.shape == (8, 3)
        u = eot_unfold(f, 4)
        np.testing.assert_allclose(np.asarray(u[0]), np.asarray(x))
        np.testing.assert_allclose(np.asarray(u[3]), np.asarray(x))


class TestShardedPurify:
    def test_sharded_matches_single_device(self, key):
        """The purify pipeline under a (data, eot) mesh must produce the
        same values as unsharded execution."""
        from tests.test_purify import unit_gaussian_score_model, PARAMS

        cfg = PurifyConfig(t=10)
        x = jax.random.normal(key, (8, 8, 8, 3))
        k = jax.random.fold_in(key, 1)

        ref = purify(unit_gaussian_score_model, PARAMS, x, k, cfg)

        mesh = make_mesh(data=4, eot=2)
        xs = jax.device_put(x, NamedSharding(mesh, P(("data", "eot"))))
        f = jax.jit(lambda xx, kk: purify(unit_gaussian_score_model, PARAMS,
                                          xx, kk, cfg))
        out = f(xs, k)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)

    def test_grad_through_sharded_purify(self, key):
        from tests.test_purify import unit_gaussian_score_model, PARAMS

        cfg = PurifyConfig(t=5)
        mesh = make_mesh(data=8)
        x = jax.random.normal(key, (8, 4, 4, 1))
        xs = jax.device_put(x, NamedSharding(mesh, P("data")))

        @jax.jit
        def g(xx, kk):
            return jax.grad(lambda z: jnp.sum(purify(
                unit_gaussian_score_model, PARAMS, z, kk, cfg) ** 2))(xx)

        out = g(xs, jax.random.fold_in(key, 1))
        assert np.isfinite(np.asarray(out)).all()


class TestEOTParallel:
    def test_vmap_matches_scan(self, key):
        """Parallel (vmap) EOT averaging == sequential scan averaging."""
        from diffpure_tpu.attacks.eot import eot_average
        import jax

        def f(k):
            return jax.random.normal(k, (4,))

        a = eot_average(f, key, 8, parallel=False)
        b = eot_average(f, key, 8, parallel=True)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)

    def test_apgd_parallel_eot_matches_scan(self, key, rng):
        from diffpure_tpu.attacks import apgd_attack, APGDConfig
        from tests.test_attacks import make_linear_model
        W = np.stack([rng.randn(16), -rng.randn(16)], 1).astype(np.float32)
        model_fn0 = make_linear_model(W * 0.1)
        x = jnp.asarray(rng.rand(4, 4, 4, 1).astype(np.float32))
        y = jnp.argmax(model_fn0(x, None), -1)

        def noisy(xx, k):
            return model_fn0(xx, None) + jax.random.normal(
                k, (xx.shape[0], 2)) * 0.02

        a_scan = apgd_attack(noisy, x, y, key, APGDConfig(
            eps=0.2, n_iter=5, eot_iter=4, eot_parallel=False))
        a_vmap = apgd_attack(noisy, x, y, key, APGDConfig(
            eps=0.2, n_iter=5, eot_iter=4, eot_parallel=True))
        np.testing.assert_allclose(np.asarray(a_scan[0]),
                                   np.asarray(a_vmap[0]), rtol=1e-4,
                                   atol=1e-5)
