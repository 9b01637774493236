"""Profiling and NFE accounting.

TPU equivalent of the reference's hand-rolled counters (ref
eval_sde_adv.py:57-91 — purifier-invocation counter + wall-clock prints,
SURVEY.md §5.1): a jax.profiler trace context, phase timers, and an NFE
(number-of-function-evaluations) ledger that lives in the integrator layer
where it belongs.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional

import jax


class NFECounter:
    """Counts score-model evaluations per phase.

    The solvers have statically known NFE per invocation (n_steps x
    evals-per-step); what is NOT static is how many times a jitted attack
    loop executes the solver (EOT scans, APGD iterations). record_nfe
    therefore inserts a host callback at trace time that fires once per
    runtime execution — counts stay correct inside compiled loops
    (SURVEY.md §5.1: NFE counting belongs in the integrator).
    """

    def __init__(self):
        self.counts: Dict[str, int] = defaultdict(int)

    def add(self, phase: str, nfe: int) -> None:
        self.counts[phase] += nfe

    def total(self) -> int:
        return sum(self.counts.values())

    def report(self) -> str:
        parts = [f"{k}={v}" for k, v in sorted(self.counts.items())]
        return f"NFE total={self.total()} ({', '.join(parts)})"


_GLOBAL_NFE: Optional[NFECounter] = None


class NFETally:
    """Trace-time NFE accumulator whose total is a *program output*.

    Host callbacks are rejected by some real backends (docs/PERF.md: the
    axon plugin fails jax.debug.callback at run time), so runtime NFE
    observability there comes from threading a counter scalar through the
    program instead (the reference's counter buffer worked everywhere,
    ref eval_sde_adv.py:57-91). Pattern, inside a scan body:

        with nfe_tally() as t:
            logits = defended(x, key)          # solvers record into t
        carry_nfe = carry_nfe + t.total        # runtime accumulation

    and after execution the host absorbs the fetched scalar via
    `absorb_nfe(t.phases, carry_nfe_out)`.  `total` is exact even for
    data-dependent NFE (traced adds); `phases` keeps the static breakdown
    for attribution.
    """

    def __init__(self):
        self._static = 0
        self._traced = None
        self.phases: Dict[str, int] = defaultdict(int)

    def add(self, phase: str, nfe) -> None:
        # Static counts accumulate as Python ints: a jnp add executed here
        # would produce a tracer of whatever INNER trace is active when the
        # solver records (e.g. the grad trace of the model region), which
        # must not escape to the consumer's trace level.
        import numpy as np
        if isinstance(nfe, (int, np.integer)):
            self._static += int(nfe)
            self.phases[phase] += int(nfe)
        else:
            # traced contribution: only legal when added at the same trace
            # level that reads .total (data-dependent NFE extension point)
            self._traced = (nfe if self._traced is None
                            else self._traced + nfe)

    @property
    def total(self):
        """Tally as an int32 scalar, materialized in the caller's trace."""
        import jax.numpy as jnp
        t = jnp.asarray(self._static, jnp.int32)
        if self._traced is not None:
            t = t + self._traced
        return t


_TALLY_STACK: list = []


@contextlib.contextmanager
def nfe_tally() -> Iterator[NFETally]:
    """Scoped device-side NFE tally; solvers traced inside feed it.

    While a tally is active, record_nfe does NOT also insert host callbacks
    (the enclosing instrumented region is responsible for absorbing the
    count — avoids double counting on callback-capable backends)."""
    t = NFETally()
    _TALLY_STACK.append(t)
    try:
        yield t
    finally:
        _TALLY_STACK.pop()


@contextlib.contextmanager
def nfe_mute() -> Iterator[None]:
    """Discard NFE records from shape-only traces (jax.eval_shape of a
    model region re-runs record_nfe; without muting, the enclosing tally
    would double-count)."""
    _TALLY_STACK.append(NFETally())
    try:
        yield
    finally:
        _TALLY_STACK.pop()


def absorb_nfe(phases: Dict[str, int], runtime_total) -> None:
    """Credit an executed program's NFE-counter output to the installed
    global ledger, attributed over the tally's static phase breakdown."""
    if _GLOBAL_NFE is None:
        return
    total = int(runtime_total)
    static_total = sum(phases.values())
    if static_total > 0:
        credited = 0
        for k, v in phases.items():
            c = total * v // static_total
            _GLOBAL_NFE.add(k, c)
            credited += c
        if credited != total:
            # floor division drops up to len(phases)-1 evals per absorption;
            # assign the remainder to the largest phase so the ledger sums
            # exactly to the program-output total
            _GLOBAL_NFE.add(max(phases, key=phases.get), total - credited)
    elif total:
        _GLOBAL_NFE.add("unattributed", total)


def set_global_nfe_counter(counter: Optional[NFECounter]) -> None:
    """Install (or clear with None) the process-wide NFE ledger. Solvers
    only insert callbacks while a counter is installed — zero overhead
    otherwise (bench paths leave it off)."""
    global _GLOBAL_NFE
    _GLOBAL_NFE = counter


@contextlib.contextmanager
def count_nfe() -> Iterator[NFECounter]:
    """Scoped NFE counting: with count_nfe() as c: ... ; c.total().

    NOTE: functions jit-compiled while no counter was installed have no
    callback baked in — trace (or re-trace) inside the context.
    """
    c = NFECounter()
    set_global_nfe_counter(c)
    try:
        yield c
    finally:
        set_global_nfe_counter(None)


# Remote-execution PJRT plugins that reject host send/recv callbacks at run
# time ("UNIMPLEMENTED: ... does not support host send/recv callbacks").
# Identified by the client's platform_version (such plugins register as
# platform "tpu", so the platform name alone cannot tell). A static check
# rather than an execution probe: the first caller is typically *inside* a
# jit trace (solvers call record_nfe at trace time), where running a probe
# program is impossible.
_CALLBACK_DENYLIST = ("axon",)
_HOST_CALLBACKS_OK: Optional[bool] = None


def host_callbacks_supported() -> bool:
    """Whether the active backend executes jax.debug.callback.

    The optional instrumentation (NFE ledger, defended-model ticks, debug
    dumps) must degrade to no-ops instead of crashing evals on hardware
    backends that cannot run host callbacks.
    """
    global _HOST_CALLBACKS_OK
    if _HOST_CALLBACKS_OK is None:
        try:
            client = jax.devices()[0].client
            pv = (getattr(client, "platform_version", "") or "").lower()
            _HOST_CALLBACKS_OK = not any(p in pv
                                         for p in _CALLBACK_DENYLIST)
        except Exception:
            _HOST_CALLBACKS_OK = False
    return _HOST_CALLBACKS_OK


def record_nfe(phase: str, nfe: int) -> None:
    """Called by solvers at trace time with their static per-invocation NFE
    (forward evaluations; gradient-pass recomputation is not counted).

    With an nfe_tally() active, feeds the device-side tally (program-output
    counting — works on callback-less backends); otherwise falls back to a
    jax.debug.callback that fires once per runtime execution."""
    if _TALLY_STACK:
        _TALLY_STACK[-1].add(phase, nfe)
        return
    if _GLOBAL_NFE is None or not host_callbacks_supported():
        return

    counter = _GLOBAL_NFE  # close over the instance active at trace time:
    # a cached executable re-run under a later count_nfe() context must not
    # bump that later context's counter (scoped-counting contract).

    def _bump():
        counter.add(phase, nfe)

    jax.debug.callback(_bump)


class PhaseTimer:
    """Wall-clock per phase (the 'sampling time per batch' metric,
    ref eval_sde_adv.py:84-87)."""

    def __init__(self):
        self.times: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        t0 = time.time()
        try:
            yield
        finally:
            self.times[name] += time.time() - t0
            self.counts[name] += 1

    def mean(self, name: str) -> float:
        return self.times[name] / max(self.counts[name], 1)

    def report(self) -> str:
        return ", ".join(f"{k}: {self.times[k]:.2f}s/{self.counts[k]}x"
                         for k in sorted(self.times))


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None) -> Iterator[None]:
    """jax.profiler trace context; view with TensorBoard/XProf."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside traced computations."""
    return jax.profiler.TraceAnnotation(name)


def flops_estimate(fn, *args) -> Optional[float]:
    """Compiled-program FLOP estimate via XLA cost analysis.

    The general replacement for the reference's thop attention counters
    (ref guided_diffusion/unet.py:316-333): counts the whole jitted program.
    Returns None when the backend doesn't expose cost analysis.
    """
    try:
        compiled = jax.jit(fn).lower(*args).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return float(cost.get("flops", 0.0))
    except Exception:
        return None


def attention_flops(batch: int, seq: int, channels: int) -> int:
    """Closed-form attention matmul FLOPs (ref unet.py:316-333):
    two (seq x seq x channels) matmuls."""
    return 2 * batch * (seq ** 2) * channels
