"""Halo-tiled fused normalize+SiLU+conv3x3(+skip) for large feature maps.

The 256px UNets (ADM ImageNet, CelebA DDPM) stay HBM-bandwidth-bound after
the two-pass tiled GroupNorm (docs/PERF.md): each ResBlock still writes and
re-reads the normalized activation around every conv. This op fuses

    out = conv3x3(silu(x * A + B), w) + b  [+ skip or skip @ w_proj + b_proj]

into one pass over row-tiles of x with a 1-row halo: exactly one HBM read
of x (plus ~2/tile_h halo overhead), one optional read of the skip tensor,
and one write of the output. A/B are the per-(example, channel) affine
coefficients produced by the GroupNorm stats pass with the GN scale/bias
and the ADM FiLM scale-shift already folded in
(ops/tiled_groupnorm.group_stats_affine); stats must be global over the
feature map, so a fully fused single-kernel block is impossible — the
two-kernel [stats -> halo-conv] pipeline is the bandwidth optimum for maps
that exceed VMEM (ref hot block: guided_diffusion/unet.py:151-264).

Tiles stream through VMEM with explicit DMAs from HBM (Pallas BlockSpecs
cannot express overlapping windows); SAME-conv zero padding is applied to
the *activation* (post-SiLU), matching the torch conv semantics.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


_VMEM_HARD_CAP = 16 * 1024 * 1024  # Mosaic scoped-vmem limit on this chip


def _pick_tile_halo(H: int, W: int, cin: int, cout: int, cr: int,
                    esize: int = 2,
                    budget: int = 11 * 1024 * 1024):
    """Largest row-tile dividing H whose working set fits the VMEM budget,
    or None when even th=1 exceeds Mosaic's 16 MB scoped-vmem cap (the
    wrapper then falls back to the unfused XLA reference instead of
    OOMing the remote compile).

    The budget must cover the replicated weight operands (dominant at
    C=512+: 9*cin*cout), the raw/activation scratches, the fp32 normalize
    temporary, the fp32 accumulator, the skip tile, and the double-buffered
    output block. esize = bytes per element of the compute dtype (2 bf16 /
    4 fp32 — the CelebA path is fp32 by default). The hard-cap check
    charges replicated weights double-buffered, matching the calibrated
    model in ops/fused_resblock.py.
    """
    weights = (9 * cin * cout + cr * cout) * esize
    hard_fit = None
    for th in (128, 64, 32, 16, 8, 4, 2, 1):
        if H % th != 0:
            continue
        per = ((th + 2) * W * cin * esize * 2   # raw rows, double-buffered
               + (th + 2) * W * cin * 4         # fp32 normalize temporary
               + (th + 2) * (W + 2) * cin * esize  # activation pad
               + th * W * cout * 4              # fp32 accumulator
               + th * W * cout * esize * 2      # double-buffered out block
               + th * W * cr * esize * 2)       # skip tile, double-buffered
        if per + 2 * weights > _VMEM_HARD_CAP:
            continue
        if hard_fit is None:
            hard_fit = th
        if per + weights <= budget:
            return th
    return hard_fit


def _halo_conv_kernel(x_hbm, a_ref, b_ref, w_ref, bias_ref, skip_hbm,
                      wproj_ref, o_ref, xraw_ref, pad_ref, skip_ref,
                      sem, sem_top, sem_bot, sem_skip, *,
                      H: int, W: int, cin: int, cout: int, cr: int,
                      th: int, has_skip: bool, has_proj: bool,
                      compute_dtype):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = pl.program_id(0)
    t = pl.program_id(1)
    T = H // th
    slot = jax.lax.rem(t, 2)
    nxt = jax.lax.rem(t + 1, 2)

    # --- double-buffered HBM streaming ----------------------------------
    # Manual-DMA operands are not auto-pipelined by Pallas: each tile's
    # copies are issued one grid step AHEAD (into the other buffer slot)
    # so they overlap the current tile's compute. The halo copies run
    # UNCONDITIONALLY, with out-of-image sources clamped to a valid row
    # (jnp.maximum/minimum below) and the compute masking those rows to
    # zero — conditional start/wait under pl.when left Mosaic logging an
    # "AsyncCopyDescriptor was not used" ERROR per boundary tile on the
    # real chip (round-3 bench tail), and a duplicated 1-row copy per
    # example is far cheaper than ambiguous DMA semantics.
    def copies(bb, tt, s):
        """Async-copy descriptors for tile tt into slot s."""
        row0 = tt * th
        out = [pltpu.make_async_copy(
            x_hbm.at[bb, pl.ds(row0, th)],
            xraw_ref.at[s, pl.ds(1, th)], sem.at[s])]
        out.append(pltpu.make_async_copy(
            x_hbm.at[bb, pl.ds(jnp.maximum(row0 - 1, 0), 1)],
            xraw_ref.at[s, pl.ds(0, 1)], sem_top.at[s]))
        out.append(pltpu.make_async_copy(
            x_hbm.at[bb, pl.ds(jnp.minimum(row0 + th, H - 1), 1)],
            xraw_ref.at[s, pl.ds(th + 1, 1)], sem_bot.at[s]))
        if has_skip:
            out.append(pltpu.make_async_copy(
                skip_hbm.at[bb, pl.ds(row0, th)], skip_ref.at[s],
                sem_skip.at[s]))
        return out

    def run_copies(bb, tt, s, op):
        for desc in copies(bb, tt, s):
            (desc.start if op == "start" else desc.wait)()

    @pl.when(t == 0)
    def _():                       # prime the pipeline for this example
        run_copies(b, 0, slot, "start")

    @pl.when(t + 1 < T)
    def _():                       # prefetch the next tile
        run_copies(b, t + 1, nxt, "start")

    run_copies(b, t, slot, "wait")

    # --- normalize + SiLU into the zero-padded activation scratch -------
    pad_ref[...] = jnp.zeros_like(pad_ref)
    x32 = xraw_ref[slot].astype(jnp.float32)
    act = x32 * a_ref[0, 0][None, None, :] + b_ref[0, 0][None, None, :]
    act = act * jax.nn.sigmoid(act)
    # SAME padding pads the activation with zeros: rows outside the image
    # must stay zero, so only write the rows that exist
    lo = jnp.where(t > 0, 0, 1)
    # mask out-of-image halo rows instead of dynamic-extent stores
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (th + 2, 1, 1), 0)
    valid = (row_ids >= lo) & (row_ids <= th + jnp.where(t < T - 1, 1, 0))
    act = jnp.where(valid, act, 0.0)
    pad_ref[:, 1:W + 1, :] = act.astype(compute_dtype)

    # --- 3x3 conv over the tile: 9 shifted (th*W, cin)@(cin, cout) ------
    acc = jnp.zeros((th, W, cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            win = pad_ref[dy:dy + th, dx:dx + W, :]
            wk = w_ref[3 * dy + dx].astype(compute_dtype)
            acc = acc + jnp.dot(
                win.reshape(th * W, cin), wk,
                preferred_element_type=jnp.float32).reshape(th, W, cout)
    acc = acc + bias_ref[0][None, None, :]

    if has_skip:
        s = skip_ref[slot]
        if has_proj:
            acc = acc + jnp.dot(
                s.astype(compute_dtype).reshape(th * W, cr),
                wproj_ref[...].astype(compute_dtype),
                preferred_element_type=jnp.float32).reshape(th, W, cout)
        else:
            acc = acc + s.astype(jnp.float32)

    o_ref[...] = acc[None].astype(o_ref.dtype)


def gn_silu_conv3x3_halo_pallas(
        x: Array, A: Array, B: Array, w: Array, bias: Array, *,
        skip: Optional[Array] = None, w_proj: Optional[Array] = None,
        out_dtype=None, interpret: bool = False) -> Array:
    """Raw Pallas call. x (N,H,W,cin); A/B (N,cin) fp32; w (3,3,cin,cout);
    skip (N,H,W,cr) with cr==cout (identity) or w_proj (cr,cout)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, H, W, cin = x.shape
    cout = w.shape[-1]
    has_skip = skip is not None
    has_proj = w_proj is not None
    cr = skip.shape[-1] if has_skip else cout
    compute_dtype = x.dtype if x.dtype in (jnp.bfloat16, jnp.float32) \
        else jnp.float32
    out_dtype = out_dtype or x.dtype
    th = _pick_tile_halo(H, W, cin, cout, cr if has_skip else 0,
                         esize=jnp.dtype(compute_dtype).itemsize)
    if th is None:
        # no tile fits Mosaic's scoped-vmem cap (e.g. wide fp32 blocks):
        # run the numerically-identical unfused XLA graph instead of
        # OOMing the remote compile
        return gn_silu_conv3x3_reference(x, A, B, w, bias, skip=skip,
                                         w_proj=w_proj, out_dtype=out_dtype)

    # weights enter VMEM replicated — keep them in the compute dtype
    # (matches nn.Conv's dtype= cast; an fp32 9*cin*cout operand at C=512
    # would alone eat 9.4 MB of the 16 MB scoped-vmem limit)
    w9 = w.reshape(9, cin, cout).astype(compute_dtype)
    if not has_skip:
        skip = jnp.zeros((N, 1, W, cr), x.dtype)
    if not has_proj:
        w_proj = jnp.zeros((cr, cout), x.dtype)
    w_proj = w_proj.astype(compute_dtype)

    kernel = functools.partial(
        _halo_conv_kernel, H=H, W=W, cin=cin, cout=cout, cr=cr, th=th,
        has_skip=has_skip, has_proj=has_proj, compute_dtype=compute_dtype)

    full = lambda *shape: pl.BlockSpec(  # noqa: E731 — replicated operand
        shape, lambda b, t: (0,) * len(shape), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kernel,
        grid=(N, H // th),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),         # x stays in HBM
            pl.BlockSpec((1, 1, cin), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cin), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            full(9, cin, cout), full(1, cout),
            pl.BlockSpec(memory_space=pl.ANY),         # skip stays in HBM
            full(cr, cout),
        ],
        out_specs=pl.BlockSpec((1, th, W, cout), lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, H, W, cout), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((2, th + 2, W, cin), x.dtype),      # double buffer
            pltpu.VMEM((th + 2, W + 2, cin), compute_dtype),
            pltpu.VMEM((2, th, W, cr), skip.dtype),
            pltpu.SemaphoreType.DMA((2,)), pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)), pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(x, A[:, None, :].astype(jnp.float32),
      B[:, None, :].astype(jnp.float32), w9,
      bias.astype(jnp.float32).reshape(1, cout), skip, w_proj)
    return out


def gn_silu_conv3x3_reference(x: Array, A: Array, B: Array, w: Array,
                              bias: Array, *, skip: Optional[Array] = None,
                              w_proj: Optional[Array] = None,
                              out_dtype=None) -> Array:
    """jnp reference with the kernel's numerics; the custom_vjp backward."""
    cdt = x.dtype if x.dtype in (jnp.bfloat16, jnp.float32) else jnp.float32
    out_dtype = out_dtype or x.dtype
    h = x.astype(jnp.float32) * A[:, None, None, :].astype(jnp.float32) \
        + B[:, None, None, :].astype(jnp.float32)
    h = h * jax.nn.sigmoid(h)
    y = jax.lax.conv_general_dilated(
        h.astype(cdt), w.astype(cdt), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")).astype(jnp.float32)
    y = y + bias.astype(jnp.float32)
    if skip is not None:
        if w_proj is not None:
            y = y + jnp.einsum("nhwc,cd->nhwd", skip.astype(cdt),
                               w_proj.astype(cdt)).astype(jnp.float32)
        else:
            y = y + skip.astype(jnp.float32)
    return y.astype(out_dtype)


def gn_conv_block_reference(x: Array, gn_scale: Array, gn_bias: Array,
                            film_scale: Optional[Array],
                            film_shift: Optional[Array], w: Array,
                            bias: Array, skip: Optional[Array],
                            w_proj: Optional[Array], num_groups: int,
                            eps: float,
                            pre_shift: Optional[Array] = None) -> Array:
    """jnp reference of the full fused stage:
    conv3x3(silu(GN(x + pre_shift)*(1+fs)+ft), w) + b [+ skip(@w_proj)]."""
    from diffpure_tpu.ops.groupnorm import group_norm

    x32 = x.astype(jnp.float32)
    if pre_shift is not None:
        x32 = x32 + pre_shift.astype(jnp.float32)[:, None, None, :]
    h = group_norm(x32, gn_scale, gn_bias, num_groups, eps)
    if film_scale is not None:
        h = h * (1.0 + film_scale.astype(jnp.float32)[:, None, None, :]) \
            + film_shift.astype(jnp.float32)[:, None, None, :]
    h = h * jax.nn.sigmoid(h)
    cdt = x.dtype if x.dtype in (jnp.bfloat16, jnp.float32) else jnp.float32
    y = jax.lax.conv_general_dilated(
        h.astype(cdt), w.astype(cdt), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")).astype(jnp.float32)
    y = y + bias.astype(jnp.float32)
    if skip is not None:
        if w_proj is not None:
            y = y + jnp.einsum("nhwc,cd->nhwd", skip.astype(cdt),
                               w_proj.astype(cdt)).astype(jnp.float32)
        else:
            y = y + skip.astype(jnp.float32)
    return y.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12))
def gn_silu_conv_block(x: Array, gn_scale: Array, gn_bias: Array,
                       film_scale: Optional[Array],
                       film_shift: Optional[Array], w: Array, bias: Array,
                       skip: Optional[Array], w_proj: Optional[Array],
                       pre_shift: Optional[Array],
                       num_groups: int, eps: float,
                       interpret: bool = False) -> Array:
    """GN(+FiLM)+SiLU+conv3x3(+skip) as [stats pass -> halo-conv pass].

    pre_shift (N, C): additive per-channel shift before the GN (the DDPM
    timestep-embedding add), folded into the affine exactly — never
    materialized over the feature map. Differentiable: the backward is
    XLA autodiff of the jnp reference — exact, but not kernel-fused.
    Backward heat by protocol: CelebA-HQ runs BPDA only (no grad through
    the purifier, ref diffpure_ddpm.py:103), but the reference's ImageNet
    AutoAttack protocol differentiates THROUGH the ADM sde purifier
    (ref run_scripts/imagenet/run_in_rand_inf.sh:15-24,
    eval_sde_adv.py:103-110), so this backward IS on that attack's hot
    path — its measured cost vs the fused forward is documented in
    docs/GRADIENTS.md (256px section)."""
    return _gn_conv_block_fwd_impl(x, gn_scale, gn_bias, film_scale,
                                   film_shift, w, bias, skip, w_proj,
                                   pre_shift, num_groups, eps, interpret)


def _gn_conv_block_fwd_impl(x, gn_scale, gn_bias, film_scale, film_shift,
                            w, bias, skip, w_proj, pre_shift, num_groups,
                            eps, interpret):
    from diffpure_tpu.ops.tiled_groupnorm import group_stats_affine

    A, B = group_stats_affine(x, gn_scale, gn_bias, num_groups, eps,
                              film_scale, film_shift, interpret=interpret,
                              pre_shift=pre_shift)
    return gn_silu_conv3x3_halo_pallas(
        x, A, B, w, bias, skip=skip, w_proj=w_proj, out_dtype=x.dtype,
        interpret=interpret)


def _gcb_fwd(x, gn_scale, gn_bias, film_scale, film_shift, w, bias, skip,
             w_proj, pre_shift, num_groups, eps, interpret):
    out = _gn_conv_block_fwd_impl(x, gn_scale, gn_bias, film_scale,
                                  film_shift, w, bias, skip, w_proj,
                                  pre_shift, num_groups, eps, interpret)
    return out, (x, gn_scale, gn_bias, film_scale, film_shift, w, bias,
                 skip, w_proj, pre_shift)


def _gcb_bwd(num_groups, eps, interpret, res, g):
    (x, gn_scale, gn_bias, film_scale, film_shift, w, bias, skip,
     w_proj, pre_shift) = res
    has = dict(film=film_scale is not None, skip=skip is not None,
               proj=w_proj is not None, shift=pre_shift is not None)
    diff = [x, gn_scale, gn_bias]
    if has["film"]:
        diff += [film_scale, film_shift]
    diff += [w, bias]
    if has["skip"]:
        diff.append(skip)
    if has["proj"]:
        diff.append(w_proj)
    if has["shift"]:
        diff.append(pre_shift)

    def ref(*args):
        it = iter(args)
        xx, gs, gb = next(it), next(it), next(it)
        fs = next(it) if has["film"] else None
        ft = next(it) if has["film"] else None
        ww, cc = next(it), next(it)
        sk = next(it) if has["skip"] else None
        wp = next(it) if has["proj"] else None
        ps = next(it) if has["shift"] else None
        return gn_conv_block_reference(xx, gs, gb, fs, ft, ww, cc, sk, wp,
                                       num_groups, eps, pre_shift=ps)

    _, vjp = jax.vjp(ref, *diff)
    grads = list(vjp(g))
    it = iter(grads)
    gx, ggs, ggb = next(it), next(it), next(it)
    gfs = next(it) if has["film"] else None
    gft = next(it) if has["film"] else None
    gw, gb_ = next(it), next(it)
    gsk = next(it) if has["skip"] else None
    gwp = next(it) if has["proj"] else None
    gps = next(it) if has["shift"] else None
    return gx, ggs, ggb, gfs, gft, gw, gb_, gsk, gwp, gps


gn_silu_conv_block.defvjp(_gcb_fwd, _gcb_bwd)
