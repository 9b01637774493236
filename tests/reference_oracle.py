"""Helpers to load the *reference* torch models as numeric oracles.

The reference repo at /root/reference is imported read-only to produce
golden outputs for checkpoint-translation parity tests. The CUDA op JIT
compile is stubbed out; CPU fallbacks take over (ref score_sde/op/upfirdn2d.py
and fused_act.py guard on device.type == 'cpu').
"""
import sys
import types
from types import SimpleNamespace

REFERENCE = "/root/reference"

_patched = False


def _patch_cpp_extension():
    global _patched
    if _patched:
        return
    import torch.utils.cpp_extension as ce

    class _NullOp:
        def __getattr__(self, name):
            raise RuntimeError("CUDA op not available in CPU tests")

    ce.load = lambda *a, **k: _NullOp()

    # The reference calls F.interpolate(x, size, 'nearest') positionally
    # (layerspp.py:117), which modern torch rejects (mode lands in
    # scale_factor). Shim it so the reference keeps its torch-1.7 behavior.
    import torch.nn.functional as F
    orig_interpolate = F.interpolate

    def _interpolate(input, size=None, scale_factor=None, mode="nearest",
                     **kw):
        if isinstance(scale_factor, str):
            mode, scale_factor = scale_factor, None
        return orig_interpolate(input, size=size, scale_factor=scale_factor,
                                mode=mode, **kw)

    F.interpolate = _interpolate

    # mister_ed's utils import torchvision (not installed); only transforms
    # attributes are touched on import paths we use — stub it.
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.transforms = types.ModuleType("torchvision.transforms")
        tv.transforms.ToTensor = object
        tv.transforms.Normalize = object
        tv.datasets = types.ModuleType("torchvision.datasets")
        tv.utils = types.ModuleType("torchvision.utils")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tv.transforms
        sys.modules["torchvision.datasets"] = tv.datasets
        sys.modules["torchvision.utils"] = tv.utils
    _patched = True


def add_reference_path():
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)


def patch_ncsn_conv_bias_bug():
    """The reference's ncsn_conv3x3/1x1 crash when bias=False
    (layers.py:44-51,109-116 scale `conv.bias.data` unconditionally) —
    NCSNv2 is dead vendored code there. Guard it so the oracle builds."""
    _patch_cpp_extension()
    add_reference_path()
    import torch.nn as tnn
    from score_sde.models import layers as ref_layers

    def ncsn_conv3x3(in_planes, out_planes, stride=1, bias=True, dilation=1,
                     init_scale=1.0, padding=1):
        init_scale = 1e-10 if init_scale == 0 else init_scale
        # second reference bug: dilated convs keep padding=1 and shrink the
        # feature map, breaking the residual adds; the original NCSNv2
        # (ermongroup/ncsnv2) pads by the dilation — restore that intent.
        if dilation > 1 and padding == 1:
            padding = dilation
        conv = tnn.Conv2d(in_planes, out_planes, stride=stride, bias=bias,
                          dilation=dilation, padding=padding, kernel_size=3)
        conv.weight.data *= init_scale
        if conv.bias is not None:
            conv.bias.data *= init_scale
        return conv

    ref_layers.ncsn_conv3x3 = ncsn_conv3x3


def patch_fir_upsample_conv():
    """Third reference bug: up_or_down_sampling.upsample_conv_2d flips the
    weight with negative-step slicing (`w[..., ::-1, ::-1]`,
    ref up_or_down_sampling.py:134), which torch has never supported — the
    FIR pyramid-upsample path is dead code there. Replace the flip with
    torch.flip (the original StyleGAN2/TF semantics)."""
    _patch_cpp_extension()
    add_reference_path()
    import torch
    import torch.nn.functional as TF
    from score_sde.models import up_or_down_sampling as uds

    def upsample_conv_2d(x, w, k=None, factor=2, gain=1):
        assert isinstance(factor, int) and factor >= 1
        convH, convW = w.shape[2], w.shape[3]
        inC = w.shape[1]
        if k is None:
            k = [1] * factor
        kk = uds._setup_kernel(k) * (gain * (factor ** 2))
        p = (kk.shape[0] - factor) - (convW - 1)
        num_groups = x.shape[1] // inC
        w2 = torch.reshape(w, (num_groups, -1, inC, convH, convW))
        w2 = torch.flip(w2, [3, 4]).permute(0, 2, 1, 3, 4)
        w2 = torch.reshape(w2, (num_groups * inC, -1, convH, convW))
        x = TF.conv_transpose2d(x, w2, stride=(factor, factor),
                                output_padding=0, padding=0)
        return uds.upfirdn2d(x, torch.tensor(kk, device=x.device),
                             pad=((p + 1) // 2 + factor - 1, p // 2 + 1))

    uds.upsample_conv_2d = upsample_conv_2d


def load_reference_ncsnpp(config):
    """Instantiate reference NCSNpp (eval mode) on CPU."""
    _patch_cpp_extension()
    add_reference_path()
    from score_sde.models import ncsnpp as ref_ncsnpp
    model = ref_ncsnpp.NCSNpp(config)
    model.eval()
    return model


def load_reference_adm(**kwargs):
    _patch_cpp_extension()
    add_reference_path()
    from guided_diffusion.unet import UNetModel
    model = UNetModel(**kwargs)
    model.eval()
    return model


def load_reference_ddpm(config):
    _patch_cpp_extension()
    add_reference_path()
    from ddpm.unet_ddpm import Model
    model = Model(config)
    model.eval()
    return model


def cifar10_ref_config(**overrides):
    """Reference-style namespace config for NCSN++ (configs/cifar10.yml)."""
    model = dict(
        sigma_min=0.01, sigma_max=50, num_scales=1000, beta_min=0.1,
        beta_max=20.0, dropout=0.1, name="ncsnpp", scale_by_sigma=False,
        ema_rate=0.9999, normalization="GroupNorm", nonlinearity="swish",
        nf=128, ch_mult=[1, 2, 2, 2], num_res_blocks=8,
        attn_resolutions=[16], resamp_with_conv=True, conditional=True,
        fir=False, fir_kernel=[1, 3, 3, 1], skip_rescale=True,
        resblock_type="biggan", progressive="none", progressive_input="none",
        progressive_combine="sum", attention_type="ddpm", init_scale=0.0,
        embedding_type="positional", fourier_scale=16, conv_size=3,
        sigma_dist=None,
    )
    model.update(overrides.pop("model", {}))
    data = dict(dataset="CIFAR10", image_size=32, num_channels=3,
                centered=True)
    data.update(overrides.pop("data", {}))
    training = dict(continuous=True, sde="vpsde")
    return SimpleNamespace(
        model=SimpleNamespace(**model),
        data=SimpleNamespace(**data),
        training=SimpleNamespace(**training),
    )


def celeba_ref_config(image_size=256, **model_overrides):
    model = dict(type="simple", in_channels=3, out_ch=3, ch=128,
                 ch_mult=[1, 1, 2, 2, 4, 4], num_res_blocks=2,
                 attn_resolutions=[16], dropout=0.0, var_type="fixedsmall",
                 ema_rate=0.999, ema=True, resamp_with_conv=True)
    model.update(model_overrides)
    data = dict(dataset="CelebA_HQ", image_size=image_size, channels=3)
    return SimpleNamespace(model=SimpleNamespace(**model),
                           data=SimpleNamespace(**data))
