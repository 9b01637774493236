"""jit with closed-over arrays lifted to arguments.

Jitting a closure that captures model parameters bakes them into the
lowered module as dense constants: ~430 MB of HLO for the 107M-param
NCSN++, which bloats executables and overflows remote-compile transports
(observed as HTTP 413 on tunneled TPU backends). `lax.scan` does not have
this problem (body consts become scan operands), but an explicit `jax.jit`
boundary does. `jax.closure_convert` does not help: it hoists only
closed-over *tracers*, leaving concrete arrays embedded.

`jit_lifted` traces the closure once with `make_jaxpr`, takes the jaxpr's
constants (exactly the captured arrays), and evaluates the jaxpr under jit
with those constants as leading arguments — so the compiled module stays
KB-sized and the parameters are transferred as ordinary buffers.
"""
from __future__ import annotations

from typing import Callable

import jax

__all__ = ["jit_lifted"]


def jit_lifted(fn: Callable, *example_args) -> Callable:
    """Return a jitted version of ``fn`` whose closed-over arrays are
    hoisted to arguments (not module constants).

    ``example_args`` must match the positional arguments ``fn`` will be
    called with (abstract shapes/dtypes suffice). The returned callable has
    the same positional signature and results as ``fn``. The captured
    constants are bound at build time: mutating a captured array between
    calls requires rebuilding via ``jit_lifted``.
    """
    closed, out_shape = jax.make_jaxpr(fn, return_shape=True)(*example_args)
    out_tree = jax.tree_util.tree_structure(out_shape)
    jaxpr, consts = closed.jaxpr, closed.consts

    def converted(consts, *args):
        args_flat = jax.tree_util.tree_leaves(args)
        out_flat = jax.core.eval_jaxpr(jaxpr, consts, *args_flat)
        return jax.tree_util.tree_unflatten(out_tree, out_flat)

    jitted = jax.jit(converted)

    def call(*args):
        return jitted(consts, *args)

    return call
