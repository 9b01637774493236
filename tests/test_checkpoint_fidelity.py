"""Real-format checkpoint fidelity: reference-generated golden fixtures.

These tests close the gap between "synthetic format tests" and "real
pretrained files" in a zero-egress environment: the *reference torch models*
are built, trained a few real EMA updates (so shadow params genuinely differ
from raw weights), serialized with torch.save in the exact on-disk layouts
the published checkpoints use, and then pulled through this repo's
file-loading entry points:

  - score_sde `checkpoint_8.pth` layout: {optimizer, model, ema, step},
    EMA applied after load (ref runners/diffpure_sde.py:160-185,
    score_sde/models/ema.py:18-105). Also the DataParallel 'module.'
    variant (ref utils.py:119-127).
  - guided_diffusion `256x256_diffusion_uncond.pt`: flat state_dict
    (ref runners/diffpure_guided.py:30-35).
  - SDEdit `celeba_hq.ckpt`: flat state_dict (ref runners/diffpure_ddpm.py:68-74).

End-to-end activation parity (fp32, atol ~2e-4) is asserted against the
reference torch model with EMA applied — any key-order, transpose, or EMA
mistake a real checkpoint would hit fails here.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import reference_oracle as ro
from diffpure_tpu.models.ncsnpp import NCSNpp
from diffpure_tpu.models.adm_unet import ADMUNet
from diffpure_tpu.models.ddpm_unet import DDPMUNet
from diffpure_tpu.models.convert import (
    load_score_sde_checkpoint,
    load_guided_diffusion_checkpoint,
    load_sdedit_checkpoint,
)


def _ema_train_steps(model, n_steps=3, decay=0.999, seed=7):
    """Real reference-EMA dynamics: perturb params (as optimizer steps
    would), ema.update after each — shadow params end up a nontrivial
    mixture of parameter history, not a copy of the weights."""
    import torch
    ro.add_reference_path()
    from score_sde.models.ema import ExponentialMovingAverage

    g = torch.Generator().manual_seed(seed)
    ema = ExponentialMovingAverage(model.parameters(), decay=decay)
    for _ in range(n_steps):
        with torch.no_grad():
            for p in model.parameters():
                p.add_(torch.randn(p.shape, generator=g) * 0.02)
        ema.update(model.parameters())
    return ema


SMALL_NCSN = dict(model=dict(nf=32, ch_mult=[1, 2], num_res_blocks=2,
                             attn_resolutions=[8]),
                  data=dict(image_size=16))
SMALL_NCSN_FLAX = dict(image_size=16, nf=32, ch_mult=(1, 2),
                       num_res_blocks=2, attn_resolutions=(8,))


class TestScoreSdeFormat:
    """The {optimizer, model, ema, step} pickle + EMA-after-load protocol."""

    def _make_checkpoint(self, tmp_path, module_prefix=False):
        import torch
        torch.manual_seed(0)
        ref = ro.load_reference_ncsnpp(ro.cifar10_ref_config(**SMALL_NCSN))
        ema = _ema_train_steps(ref)

        model_sd = ref.state_dict()
        if module_prefix:
            model_sd = {f"module.{k}": v for k, v in model_sd.items()}
        opt = torch.optim.Adam(ref.parameters(), lr=2e-4)
        state = dict(optimizer=opt.state_dict(), model=model_sd,
                     ema=ema.state_dict(), step=8)
        path = str(tmp_path / "checkpoint_8.pth")
        torch.save(state, path)

        # the reference's post-load step: overwrite params with EMA
        # (diffpure_sde.py:179-182)
        ema.copy_to(ref.parameters())
        return path, ref

    def _assert_parity(self, path, ref):
        import torch
        params = load_score_sde_checkpoint(path)
        model = NCSNpp(**SMALL_NCSN_FLAX)
        rng = np.random.RandomState(11)
        x = rng.randn(2, 3, 16, 16).astype(np.float32) * 0.5
        t = np.array([99.9, 500.0], dtype=np.float32)
        with torch.no_grad():
            want = ref(torch.from_numpy(x), torch.from_numpy(t)).numpy()
        got = np.asarray(model.apply(
            params, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(t)))
        np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want,
                                   rtol=1e-3, atol=2e-4)

    def test_checkpoint_file_roundtrip(self, tmp_path):
        path, ref = self._make_checkpoint(tmp_path)
        self._assert_parity(path, ref)

    def test_dataparallel_module_prefix(self, tmp_path):
        path, ref = self._make_checkpoint(tmp_path, module_prefix=True)
        self._assert_parity(path, ref)

    def test_ema_actually_applied(self, tmp_path):
        """Guards the EMA step itself: loading must NOT equal raw weights."""
        import torch
        from diffpure_tpu.models.convert import translate_ncsnpp
        torch.manual_seed(0)
        ref = ro.load_reference_ncsnpp(ro.cifar10_ref_config(**SMALL_NCSN))
        raw_sd = {k: v.clone() for k, v in ref.state_dict().items()}
        ema = _ema_train_steps(ref)
        opt = torch.optim.Adam(ref.parameters(), lr=2e-4)
        path = str(tmp_path / "checkpoint_8.pth")
        torch.save(dict(optimizer=opt.state_dict(), model=ref.state_dict(),
                        ema=ema.state_dict(), step=8), path)

        loaded = load_score_sde_checkpoint(path)
        raw = translate_ncsnpp(raw_sd)
        diffs = jax.tree_util.tree_map(
            lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
            loaded, raw)
        assert max(jax.tree_util.tree_leaves(diffs)) > 1e-3


class TestGuidedDiffusionFormat:
    def test_flat_state_dict_file(self, tmp_path):
        import torch
        torch.manual_seed(1)
        kwargs = dict(image_size=32, in_channels=3, model_channels=32,
                      out_channels=6, num_res_blocks=1,
                      attention_resolutions=(4,), dropout=0.0,
                      channel_mult=(1, 2), num_head_channels=16,
                      use_scale_shift_norm=True, resblock_updown=True)
        ref = ro.load_reference_adm(**kwargs)
        path = str(tmp_path / "diffusion_uncond.pt")
        torch.save(ref.state_dict(), path)

        params = load_guided_diffusion_checkpoint(path)
        model = ADMUNet(**kwargs)
        rng = np.random.RandomState(12)
        x = rng.randn(2, 3, 32, 32).astype(np.float32) * 0.5
        t = np.array([100, 750], dtype=np.int64)
        with torch.no_grad():
            want = ref(torch.from_numpy(x), torch.from_numpy(t)).numpy()
        got = np.asarray(model.apply(
            params, jnp.asarray(x.transpose(0, 2, 3, 1)),
            jnp.asarray(t.astype(np.int32))))
        np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want,
                                   rtol=1e-3, atol=2e-4)


class TestSDEditFormat:
    def test_flat_state_dict_file(self, tmp_path):
        import torch
        torch.manual_seed(2)
        cfg = ro.celeba_ref_config(image_size=32, ch=32, ch_mult=[1, 2],
                                   num_res_blocks=1, attn_resolutions=[16])
        ref = ro.load_reference_ddpm(cfg)
        path = str(tmp_path / "celeba_hq.ckpt")
        torch.save(ref.state_dict(), path)

        params = load_sdedit_checkpoint(path)
        model = DDPMUNet(resolution=32, ch=32, ch_mult=(1, 2),
                         num_res_blocks=1, attn_resolutions=(16,))
        rng = np.random.RandomState(13)
        x = rng.randn(2, 3, 32, 32).astype(np.float32) * 0.5
        t = np.array([100, 900], dtype=np.int64)
        with torch.no_grad():
            want = ref(torch.from_numpy(x), torch.from_numpy(t)).numpy()
        got = np.asarray(model.apply(
            params, jnp.asarray(x.transpose(0, 2, 3, 1)),
            jnp.asarray(t.astype(np.int32))))
        np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want,
                                   rtol=1e-3, atol=2e-4)
