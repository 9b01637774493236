"""EOT averaging as a scan — O(1) compiled-program size in eot_iter.

A Python loop over EOT reps would inline eot_iter copies of the purify
graph (20x the HLO at the Rand protocol's eot_iter=20); scanning over the
stacked keys traces the defended forward exactly once.
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def eot_keys(key: Array, n: int) -> Array:
    return jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(n))


def eot_average(fn: Callable[[Array], object], key: Array, n: int,
                parallel: bool = False):
    """Mean of fn(k) over n derived keys.

    fn returns an arbitrary pytree; n == 1 short-circuits.

    parallel=False: sequential scan — O(1) memory in n (single-chip default).
    parallel=True: vmap over the EOT axis — all reps in flight at once;
    under a mesh with an 'eot' axis XLA shards the reps across chips and the
    mean lowers to a psum (SURVEY.md §2.6 "EOT batched across chips").
    """
    if n == 1:
        return fn(jax.random.fold_in(key, 0))
    keys = eot_keys(key, n)

    if parallel:
        outs = jax.vmap(fn)(keys)
        return jax.tree_util.tree_map(lambda v: jnp.mean(v, axis=0), outs)

    def body(acc, k):
        out = fn(k)
        acc = jax.tree_util.tree_map(jnp.add, acc, out)
        return acc, None

    # zero-init from eval_shape: materializing fn(keys[0]) outside the scan
    # would inline a second full copy of the defended-forward graph.
    from diffpure_tpu.utils.profiling import nfe_mute
    with nfe_mute():  # shape-only trace must not feed the NFE tally
        shapes = jax.eval_shape(fn, keys[0])
    init = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype),
                                  shapes)
    acc, _ = jax.lax.scan(body, init, keys)
    return jax.tree_util.tree_map(lambda v: v / n, acc)
