"""Perturbation framework, spatial transforms, recoloradv, mister_ed attacks."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffpure_tpu.attacks.perturbations import (
    DeltaAddition, ParameterizedXformAdv, SequentialPerturbation, ThreatModel,
    batchwise_norm,
)
from diffpure_tpu.attacks.spatial import (
    FullSpatial, Affine, Rotation, Translation,
)
from diffpure_tpu.attacks.recoloradv import (
    RGBColorSpace, YPbPrColorSpace, AffineColorTransform,
    FullSpatialColorTransform, ReColorAdv,
)
from diffpure_tpu.attacks.mister_ed import (
    MisterEdPGDConfig, perturbation_pgd, fgsm, carlini_wagner,
    CarliniWagnerConfig,
)
from tests.test_attacks import make_linear_model


@pytest.fixture
def setup(rng):
    w = rng.randn(48).astype(np.float32)
    W = np.stack([w, -w], 1) * 0.1
    model_fn = make_linear_model(W)
    x = jnp.asarray(rng.rand(4, 4, 4, 3).astype(np.float32) * 0.5 + 0.25)
    y = jnp.argmax(model_fn(x, None), -1)
    return model_fn, x, y


class TestDeltaAddition:
    def test_project_linf(self, setup, key):
        _, x, _ = setup
        d = DeltaAddition(lp_style="inf", lp_bound=0.1)
        delta = jnp.ones_like(x)
        p = d.project(delta, x)
        assert float(jnp.abs(p).max()) <= 0.1 + 1e-6
        assert np.asarray(d.apply(p, x)).max() <= 1.0

    def test_project_l2(self, setup):
        _, x, _ = setup
        d = DeltaAddition(lp_style=2, lp_bound=0.5)
        p = d.project(jnp.ones_like(x) * 10, x)
        n = batchwise_norm(p, 2)
        assert (np.asarray(n) <= 0.5 + 1e-4).all()

    def test_random_init_in_ball(self, setup, key):
        _, x, _ = setup
        d = DeltaAddition(lp_style="inf", lp_bound=0.1)
        p = d.random_init(key, d.init_params(x), x)
        assert float(jnp.abs(p).max()) <= 0.1 + 1e-6

    def test_merge(self, setup):
        _, x, _ = setup
        d = DeltaAddition()
        a = jnp.ones_like(x)
        b = jnp.zeros_like(x)
        m = d.merge(a, b, jnp.array([1, 0, 1, 0]))
        np.testing.assert_allclose(np.asarray(m)[0], 1.0)
        np.testing.assert_allclose(np.asarray(m)[1], 0.0)


class TestThreatModel:
    def test_factory(self):
        tm = ThreatModel.create(DeltaAddition, lp_style="inf", lp_bound=0.03)
        p = tm()
        assert isinstance(p, DeltaAddition)
        assert p.lp_bound == 0.03


class TestSpatialTransforms:
    def test_identity_transforms_are_noops(self, setup):
        _, x, _ = setup
        for T in [FullSpatial(), Affine(), Rotation(), Translation()]:
            p = T.identity_params(x)
            out = T.apply(p, x)
            np.testing.assert_allclose(np.asarray(out), np.asarray(x),
                                       rtol=1e-3, atol=1e-4)

    def test_translation_shifts(self, rng):
        x = np.zeros((1, 8, 8, 1), np.float32)
        x[0, 4, 4, 0] = 1.0
        T = Translation()
        # +x translation in grid space samples from shifted coords
        txy = jnp.array([[0.25, 0.0]])
        out = np.asarray(T.apply(txy, jnp.asarray(x)))
        assert out[0, 4, 4, 0] < 1.0  # peak moved
        assert out.sum() > 0.5

    def test_rotation_90_maps_correctly(self):
        x = np.zeros((1, 8, 8, 1), np.float32)
        x[0, 2, :, 0] = 1.0  # horizontal stripe
        R = Rotation()
        out = np.asarray(R.apply(jnp.array([np.pi / 2]), jnp.asarray(x)))
        # after 90deg the stripe is vertical-ish: column sums concentrated
        col_var = out[0, :, :, 0].sum(axis=0).var()
        row_var = out[0, :, :, 0].sum(axis=1).var()
        assert col_var > row_var

    def test_sequential(self, setup, key):
        _, x, _ = setup
        seq = SequentialPerturbation(layers=(
            ParameterizedXformAdv(xform=Translation(), lp_bound=0.1),
            DeltaAddition(lp_style="inf", lp_bound=0.05),
        ))
        p = seq.init_params(x)
        out = seq.apply(p, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x),
                                   rtol=1e-3, atol=1e-4)
        p2 = seq.random_init(key, p, x)
        out2 = seq.apply(p2, x)
        assert not np.allclose(np.asarray(out2), np.asarray(x))
        n = seq.norm(p2, x, lp=2)
        assert n.shape == (4,)


class TestReColorAdv:
    def test_ypbpr_roundtrip(self, rng):
        cs = YPbPrColorSpace()
        x = jnp.asarray(rng.rand(2, 4, 4, 3).astype(np.float32))
        back = cs.to_rgb(cs.from_rgb(x))
        np.testing.assert_allclose(np.asarray(back), np.asarray(x),
                                   rtol=1e-4, atol=1e-5)

    def test_identity_lut_is_noop(self, rng):
        T = FullSpatialColorTransform(resolution=8)
        x = jnp.asarray(rng.rand(2, 4, 4, 3).astype(np.float32))
        lut = T.identity_params(x)
        out = T.apply(lut, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x),
                                   rtol=1e-4, atol=1e-5)

    def test_affine_color(self, rng):
        T = AffineColorTransform()
        x = jnp.asarray(rng.rand(2, 4, 4, 3).astype(np.float32))
        theta = T.identity_params(x)
        np.testing.assert_allclose(np.asarray(T.apply(theta, x)),
                                   np.asarray(x), rtol=1e-5)

    def test_recoloradv_perturbation(self, setup, key):
        _, x, _ = setup
        p = ReColorAdv(lp_bound=0.1)
        params = p.init_params(x)
        out = p.apply(params, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x),
                                   rtol=1e-3, atol=1e-4)
        projected = p.project(params + 1.0, x)
        d = projected - p.init_params(x)
        assert float(jnp.abs(d).max()) <= 0.1 + 1e-5

    def test_lut_smoothness_norm(self, rng):
        T = FullSpatialColorTransform(resolution=4)
        x = jnp.zeros((1, 2, 2, 3))
        ident = T.identity_params(x)
        assert float(T.smoothness_norm(ident)[0]) < 1e-3
        noisy = ident + jnp.asarray(
            rng.randn(*ident.shape).astype(np.float32) * 0.1)
        assert float(T.smoothness_norm(noisy)[0]) > 0.1


class TestMisterEdAttacks:
    def test_delta_pgd_increases_errors(self, setup, key):
        model_fn, x, y = setup
        pert = DeltaAddition(lp_style="inf", lp_bound=0.3)
        cfg = MisterEdPGDConfig(num_iterations=30, step_size=0.03)
        x_adv, found = perturbation_pgd(model_fn, pert, x, y, key, cfg)
        assert np.asarray(found).any()
        assert float(jnp.abs(x_adv - x).max()) <= 0.3 + 1e-5

    def test_adam_variant(self, setup, key):
        model_fn, x, y = setup
        pert = DeltaAddition(lp_style="inf", lp_bound=0.3)
        cfg = MisterEdPGDConfig(num_iterations=40, optimizer_lr=0.05,
                                signed=False)
        x_adv, found = perturbation_pgd(model_fn, pert, x, y, key, cfg)
        assert np.asarray(found).any()

    def test_fgsm(self, setup, key):
        model_fn, x, y = setup
        x_adv = fgsm(model_fn, x, y, key, eps=0.1)
        from diffpure_tpu.attacks import ce_loss
        assert (float(ce_loss(model_fn(x_adv, None), y).mean())
                > float(ce_loss(model_fn(x, None), y).mean()))

    def test_carlini_wagner(self, setup, key):
        model_fn, x, y = setup
        cfg = CarliniWagnerConfig(num_iterations=80, lr=0.05,
                                  initial_const=10.0)
        x_adv, found = carlini_wagner(model_fn, x, y, key, cfg)
        assert np.asarray(found).any()
        # successful examples have small distortion
        d = np.linalg.norm(np.asarray(x_adv - x).reshape(4, -1), axis=-1)
        assert d[np.asarray(found)].max() < 3.0
