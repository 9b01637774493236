"""Per-layer golden activation traces: reference torch NCSN++ vs flax.

SURVEY.md §4's golden-value strategy: when bringing up a real checkpoint,
compare every module's output between the reference model and the
translated flax model to localize the first divergence. The reference's
all_modules.{i} corresponds to flax m{i} by construction, so traces align
by index.

Usage (with the reference importable and a checkpoint on disk):
    python scripts/golden_trace.py --ckpt pretrained/score_sde/checkpoint_8.pth
Without a checkpoint it runs the random-weight self-check.
"""
import argparse
import sys

import numpy as np

sys.path.insert(0, "tests")


def torch_module_traces(ref_model, x_nchw, t):
    """Forward with hooks on every all_modules[i] (NCHW outputs)."""
    import torch
    traces = {}
    hooks = []
    for i, m in enumerate(ref_model.all_modules):
        def make_hook(idx):
            def hook(mod, inputs, output):
                traces[f"m{idx}"] = output.detach().numpy()
            return hook
        hooks.append(m.register_forward_hook(make_hook(i)))
    with torch.no_grad():
        out = ref_model(torch.from_numpy(x_nchw), torch.from_numpy(t))
    for h in hooks:
        h.remove()
    traces["__out__"] = out.numpy()
    return traces


def flax_module_traces(model, params, x_nhwc, t):
    """Forward with capture_intermediates; module outputs keyed m{i}."""
    import jax.numpy as jnp
    out, state = model.apply(params, jnp.asarray(x_nhwc), jnp.asarray(t),
                             capture_intermediates=True)
    traces = {}
    inter = state["intermediates"]
    for name, v in inter.items():
        if name.startswith("m"):
            arr = np.asarray(v["__call__"][0])
            if arr.ndim == 4:  # NHWC -> NCHW for comparison
                arr = arr.transpose(0, 3, 1, 2)
            traces[name] = arr
    traces["__out__"] = np.asarray(out).transpose(0, 3, 1, 2)
    return traces


def compare_traces(ref, got, atol=5e-4, rtol=1e-3, log=print):
    """Report the first diverging module (indices sorted numerically)."""
    keys = sorted((k for k in ref if k != "__out__"),
                  key=lambda s: int(s[1:]))
    first_bad = None
    for k in keys + ["__out__"]:
        if k not in got:
            log(f"{k}: MISSING in flax traces")
            continue
        a, b = ref[k], got[k]
        if a.shape != b.shape:
            log(f"{k}: shape mismatch {a.shape} vs {b.shape}")
            first_bad = first_bad or k
            continue
        err = np.abs(a - b).max()
        scale = np.abs(a).max() + 1e-12
        ok = err <= atol + rtol * scale
        log(f"{k}: max|diff|={err:.3e} (scale {scale:.3e}) "
            f"{'OK' if ok else '<-- DIVERGES'}")
        if not ok and first_bad is None:
            first_bad = k
    return first_bad


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt", type=str, default="")
    parser.add_argument("--small", action="store_true",
                        help="random-weight self-check on a small config")
    args = parser.parse_args()

    import jax
    import reference_oracle as ro
    from diffpure_tpu.models.convert import (
        load_score_sde_checkpoint, translate_ncsnpp,
    )
    from diffpure_tpu.models.ncsnpp import NCSNpp

    if args.ckpt:
        cfg = ro.cifar10_ref_config()
        ref = ro.load_reference_ncsnpp(cfg)
        import torch
        state = torch.load(args.ckpt, map_location="cpu", weights_only=False)
        ref.load_state_dict(state["model"])
        params = load_score_sde_checkpoint(args.ckpt)
        model = NCSNpp()
        size = 32
    else:
        cfg = ro.cifar10_ref_config(
            model=dict(nf=32, ch_mult=[1, 2], num_res_blocks=1,
                       attn_resolutions=[8]),
            data=dict(image_size=16))
        ref = ro.load_reference_ncsnpp(cfg)
        params = translate_ncsnpp(ref.state_dict())
        model = NCSNpp(image_size=16, nf=32, ch_mult=(1, 2),
                       num_res_blocks=1, attn_resolutions=(8,))
        size = 16

    rng = np.random.RandomState(0)
    x = rng.randn(1, 3, size, size).astype(np.float32) * 0.5
    t = np.array([99.9], dtype=np.float32)
    ref_traces = torch_module_traces(ref, x, t)
    got_traces = flax_module_traces(model, params,
                                    x.transpose(0, 2, 3, 1), t)
    first_bad = compare_traces(ref_traces, got_traces)
    if first_bad:
        print(f"\nFIRST DIVERGENCE: {first_bad}")
        sys.exit(1)
    print("\nall modules match")


if __name__ == "__main__":
    main()
