"""Quantify the CIFAR headline residual: GN serialization vs MXU efficiency.

docs/PERF.md attributes the ~15 ms/eval gap between the shipping fused
kernel (37.3 ms/eval) and the pure-conv floor (~22.5 ms) to two causes
without numbers: (a) sub-1k-K MXU efficiency of the 9-shifted-matmul conv
form and (b) GroupNorm statistics serialized with the conv matmuls. This
script measures both.

Part 1 — GN cost in situ (full-model config-delta, the only measurement
style that has been trustworthy on this backend): time one NCSN++ eval
with the fused kernels as shipped vs with GroupNorm statistics replaced by
a pure affine inside the same kernel (set_perf_skip_gn_stats). The delta
is the end-to-end cost of GN stats + normalize + their serialization.

Part 2 — MXU efficiency of the conv matmul form (Pallas microkernel,
VMEM-resident operands, R repeats per grid step to amortize io): sustains
of  9 x (M, K) @ (K, N)  at the model's dominant shapes, plus the
im2col-style single (M, 9K) @ (9K, N) as the upper bound on what a
K-widened conv form could win (ignoring its gather/VMEM costs).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_residual.py
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def part1_gn_delta(batch=128, iters=4, chain=16):
    from diffpure_tpu.models.ncsnpp import NCSNpp
    from diffpure_tpu.ops import fused_resblock as fr

    model = NCSNpp(dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (batch, 32, 32, 3)) * 2 - 1
    t = jnp.full((batch,), 0.5)
    params = model.init(jax.random.fold_in(key, 1),
                        jnp.zeros((1, 32, 32, 3)), jnp.zeros((1,)))

    out = {}
    # (tag, skip_gn_stats, conv_form); im2col is the in-situ form of the
    # part-2 upper bound — it may fail remote compile (unmodeled VMEM for
    # the (M, 9K) window matrix), which is itself the answer
    for tag, skip, form in (("shipped", False, "mm9"),
                            ("gn_free", True, "mm9"),
                            ("im2col", False, "im2col")):
        fr.set_perf_skip_gn_stats(skip)
        fr.set_conv_form(form)
        try:
            # chain evals inside ONE jit so the ~20ms remote-dispatch RPC
            # is amortized (single-eval dispatches are overhead-dominated
            # on this backend — same lesson as scripts/perf_conv.py)
            def chained(p, xx):
                y = jax.lax.fori_loop(
                    0, chain,
                    lambda i, y: xx + 0.01 * model.apply(p, y, t), xx)
                return jnp.float32(jnp.abs(y).sum())
            run = jax.jit(chained)
            t0 = time.time()
            float(run(params, x))
            compile_s = time.time() - t0
            t0 = time.time()
            for _ in range(iters):
                float(run(params, x))
            dt = (time.time() - t0) / iters / chain
            out[f"eval_ms_{tag}"] = round(dt * 1e3, 2)
            print(f"{tag}: {dt * 1e3:.2f} ms/eval "
                  f"(compile {compile_s:.0f}s)", flush=True)
        except Exception as e:  # noqa: BLE001 — record compile OOMs
            out[f"eval_ms_{tag}"] = None
            out[f"error_{tag}"] = _one_line_reason(e)
            print(f"{tag}: FAILED {out[f'error_{tag}']}", flush=True)
    fr.set_perf_skip_gn_stats(False)
    fr.set_conv_form("mm9")
    if out.get("eval_ms_gn_free") and out.get("eval_ms_shipped"):
        out["gn_stats_cost_ms"] = round(
            out["eval_ms_shipped"] - out["eval_ms_gn_free"], 2)
    return out


def _one_line_reason(e: Exception) -> str:
    """Publishable one-line failure reason: exception type + first
    non-empty message line, ANSI escapes stripped (a raw MosaicError blob
    in a results artifact helps nobody)."""
    import re
    msg = re.sub(r"\x1b\[[0-9;]*m", "", str(e))
    first = next((ln.strip() for ln in msg.splitlines() if ln.strip()),
                 "")
    return f"{type(e).__name__}: {first[:160]}"


def _mm9_kernel(a_ref, w_ref, o_ref, *, R, M, K, N):
    """R repeats of 9 shifted-style (M,K)@(K,N) matmuls from VMEM.

    Two elimination hazards, both hit by earlier runs of this script:
    (1) within one body, R identical repeats CSE down to one — defeated by
    feeding each repeat's accumulator back into the next LHS; (2) across
    grid steps, a body that doesn't depend on the grid index is
    loop-invariant and Mosaic hoists it out of the grid loop entirely, so
    the two-grid delta measures ~0 and the derived TFLOP/s reads >peak
    (the r5 run measured an impossible 9.9e9 TFLOP/s) — defeated by
    carrying the accumulator through the revisited output block, making
    every grid step depend on the previous one. Requires N == K so acc
    can feed back into the LHS shape."""
    import jax.experimental.pallas as pl
    assert N == K

    @pl.when(pl.program_id(0) == 0)
    def _init():
        o_ref[...] = jnp.zeros_like(o_ref)

    acc = o_ref[...].astype(jnp.float32)
    # cross-step dependence: this step's LHS reads last step's output
    x = a_ref[...] + (acc * 1e-30).astype(a_ref.dtype)
    for r in range(R):
        for k in range(9):
            acc = acc + jnp.dot(x, w_ref[k],
                                preferred_element_type=jnp.float32)
        x = x + (acc * 1e-30).astype(x.dtype)
    o_ref[...] = acc.astype(o_ref.dtype)


def _mm1_kernel(a_ref, w_ref, o_ref, *, R, M, K9, N):
    """R repeats of the im2col-form single (M,9K)@(9K,N) matmul, with the
    same anti-CSE and anti-hoist serial dependences as _mm9_kernel (acc
    tiled 9x along the K axis to match the (M,9K) LHS)."""
    import jax.experimental.pallas as pl
    assert K9 == 9 * N

    @pl.when(pl.program_id(0) == 0)
    def _init():
        o_ref[...] = jnp.zeros_like(o_ref)

    acc = o_ref[...].astype(jnp.float32)
    x = a_ref[...] + jnp.tile(acc * 1e-30, (1, 9)).astype(a_ref.dtype)
    for r in range(R):
        acc = acc + jnp.dot(x, w_ref[...],
                            preferred_element_type=jnp.float32)
        x = x + jnp.tile(acc * 1e-30, (1, 9)).astype(x.dtype)
    o_ref[...] = acc.astype(o_ref.dtype)


def _bench_kernel(kernel, a, w, out_shape, flops_per_step, iters=8,
                  grids=(64, 320)):
    """TFLOP/s from the wall-clock DELTA between two grid sizes of the
    same kernel — cancels the fixed per-dispatch RPC overhead exactly
    (~20ms on this remote backend, which swamps single-call timings)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interpret = bool(os.environ.get("PERF_RESIDUAL_INTERPRET"))

    def timed(G):
        run = jax.jit(lambda a_, w_: pl.pallas_call(
            kernel,
            grid=(G,),
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interpret,
        )(a_, w_).sum())
        float(run(a, w))
        t0 = time.time()
        for _ in range(iters):
            float(run(a, w))
        return (time.time() - t0) / iters

    t_lo, t_hi = timed(grids[0]), timed(grids[1])
    dt = max(t_hi - t_lo, 1e-9) / (grids[1] - grids[0])
    # raw per-grid timings ride along so an impossible derived number is
    # diagnosable from the artifact alone
    return flops_per_step / dt / 1e12, t_lo, t_hi


def _xla_dot_tflops(key, M, K, N, *, nine, chains=(16, 80), iters=8):
    """Cross-check: the same dot shapes timed as a serial lax.fori_loop
    chain inside one plain-XLA jit (no Pallas) — two chain lengths, delta
    cancels the per-dispatch RPC. The carry feeds each iteration's
    accumulator into the next LHS, so iterations can be neither CSEd nor
    hoisted. Measures the MXU at the shape itself; agreement with the
    Pallas kernel numbers rules out harness artifacts on either side."""
    a = jax.random.normal(key, (M, 9 * K if not nine else K), jnp.bfloat16)
    w = jax.random.normal(key, (9, K, N) if nine else (9 * K, N),
                          jnp.bfloat16)
    flops_per_step = 2.0 * M * K * N * 9

    def timed(chain):
        def body(i, carry):
            x, acc = carry
            if nine:
                for k in range(9):
                    acc = acc + jnp.dot(x, w[k],
                                        preferred_element_type=jnp.float32)
                x = x + (acc * 1e-30).astype(x.dtype)
            else:
                acc = acc + jnp.dot(x, w,
                                    preferred_element_type=jnp.float32)
                x = x + jnp.tile(acc * 1e-30, (1, 9)).astype(x.dtype)
            return x, acc

        @jax.jit
        def run(a_):
            _, acc = jax.lax.fori_loop(
                0, chain, body, (a_, jnp.zeros((M, N), jnp.float32)))
            return acc.sum()

        float(run(a))
        t0 = time.time()
        for _ in range(iters):
            float(run(a))
        return (time.time() - t0) / iters

    t_lo, t_hi = timed(chains[0]), timed(chains[1])
    dt = max(t_hi - t_lo, 1e-9) / (chains[1] - chains[0])
    return flops_per_step / dt / 1e12, t_lo, t_hi


def part2_mxu(peak_tflops=197.0):
    key = jax.random.PRNGKey(0)
    out = {}

    def record(tag, tf, t_lo, t_hi):
        if tf > peak_tflops:
            # refuse to publish an impossible number, but keep the raw
            # timings so the failure is diagnosable from the artifact
            out[f"error_{tag}"] = (
                f"measured {tf:.3g} TFLOP/s > {peak_tflops} peak - work "
                f"optimized away (t_lo {t_lo * 1e3:.1f} ms, t_hi "
                f"{t_hi * 1e3:.1f} ms); numbers withheld")
            print(f"{tag}: INVALID {out[f'error_{tag}']}", flush=True)
            return
        out[f"{tag}_tflops"] = round(tf, 1)
        out[f"{tag}_mxu_eff"] = round(tf / peak_tflops, 3)
        out[f"{tag}_t_ms"] = [round(t_lo * 1e3, 2), round(t_hi * 1e3, 2)]
        print(f"{tag}: {tf:.1f} TFLOP/s ({tf / peak_tflops:.0%} of peak, "
              f"t {t_lo * 1e3:.1f}->{t_hi * 1e3:.1f} ms)", flush=True)

    def guarded(tag, fn, *a, **k):
        # one kernel's compile failure (remote tpu_compile_helper crashes
        # are routine on this backend) must not discard the measurements
        # that already succeeded — the r5b/r5e runs both lost their mm9/
        # mm1 numbers this way
        try:
            record(tag, *fn(*a, **k))
        except Exception as e:  # noqa: BLE001
            out[f"error_{tag}"] = _one_line_reason(e)
            print(f"{tag}: FAILED {out[f'error_{tag}']}", flush=True)

    # dominant fused-conv shapes: (bt*H*W, K) at the 32x32 (bt=2, K=128)
    # and 16x16 (bt=4, K=256) levels of the CIFAR model
    for (M, K, N, R) in ((2048, 128, 128, 64), (1024, 256, 256, 32)):
        a = jax.random.normal(key, (M, K), jnp.bfloat16)
        w9 = jax.random.normal(key, (9, K, N), jnp.bfloat16)
        flops = 2.0 * M * K * N * 9 * R
        guarded(f"mm9_{M}x{K}x{N}", _bench_kernel,
                functools.partial(_mm9_kernel, R=R, M=M, K=K, N=N),
                a, w9, (M, N), flops)

        a1 = jax.random.normal(key, (M, 9 * K), jnp.bfloat16)
        w1 = jax.random.normal(key, (9 * K, N), jnp.bfloat16)
        guarded(f"mm1_{M}x{9 * K}x{N}", _bench_kernel,
                functools.partial(_mm1_kernel, R=R, M=M, K9=9 * K, N=N),
                a1, w1, (M, N), flops)

        # independent XLA-dot cross-check of both forms at the same shape
        guarded(f"mm9_xla_{M}x{K}x{N}",
                _xla_dot_tflops, key, M, K, N, nine=True)
        guarded(f"mm1_xla_{M}x{9 * K}x{N}",
                _xla_dot_tflops, key, M, K, N, nine=False)
    return out


def main():
    # --part2-only: re-measure just the MXU microbench and merge into the
    # existing artifact (used to replace the CSE-invalidated mm numbers
    # without re-paying part 1's full-model compiles)
    part2_only = "--part2-only" in sys.argv
    out = {"device": getattr(jax.devices()[0], "device_kind", "?")}
    path = "docs/perf_residual.json"
    if part2_only and os.path.exists(path):
        with open(path) as f:
            out.update(json.load(f))
        # note_mm documented the withdrawn CSE-invalidated numbers; it
        # must not survive next to freshly measured mm9_/mm1_ fields
        out = {k: v for k, v in out.items()
               if not (k.startswith(("mm9_", "mm1_", "error_part2",
                                     "error_mm", "note_mm")))}

    def flush():
        # write incrementally so a crash in a later part never loses the
        # numbers a finished part already measured
        with open(path, "w") as f:
            json.dump(out, f, indent=2)

    parts = (("part2_mxu", part2_mxu),) if part2_only else \
        (("part2_mxu", part2_mxu), ("part1_gn_delta", part1_gn_delta))
    for name, part in parts:
        try:
            out.update(part())
        except Exception as e:  # noqa: BLE001
            out[f"error_{name}"] = _one_line_reason(e)
            print(f"{name}: FAILED {out[f'error_{name}']}", flush=True)
        flush()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
