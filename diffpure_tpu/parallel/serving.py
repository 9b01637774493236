"""Multi-chip serving of the defended forward via shard_map.

jit + sharding annotations auto-partition the *unfused* graph (XLA SPMD),
but `pallas_call` kernels are opaque to the SPMD partitioner — under a
sharded jit XLA would gather the batch around them. shard_map runs the
whole defended step per-shard instead: each device executes the fused
kernels on its local batch tile, and no collectives are needed at all for
the embarrassingly-parallel purify+classify forward
(docs/PERF.md "Multi-chip note").

Randomness: the base key is folded with the shard's mesh position so
different shards draw different defense noise (the single big
jax.random.normal over the full batch would otherwise be replicated
per-shard). This changes the exact noise stream relative to single-chip
execution — valid for a stochastic defense, but bit-reproducibility is
per-topology.
"""
from __future__ import annotations

from typing import Callable

import jax
from jax.sharding import Mesh, PartitionSpec as P

Array = jax.Array


def shard_defended_call(call: Callable[[object, object, Array, Array], Array],
                        mesh: Mesh) -> Callable:
    """Wrap call(score_params, clf_params, x01, key) -> logits for a
    ('data','eot') mesh: params replicated, batch sharded over both axes.

    Returns a jitted function with the same signature; x01's leading axis
    must be divisible by mesh.size.
    """
    from jax import shard_map

    batch_spec = P(("data", "eot"))

    def per_shard(score_params, clf_params, x01, key):
        shard_id = (jax.lax.axis_index("data") * mesh.shape["eot"]
                    + jax.lax.axis_index("eot"))
        k = jax.random.fold_in(key, shard_id)
        return call(score_params, clf_params, x01, k)

    sharded = shard_map(
        per_shard, mesh=mesh,
        in_specs=(P(), P(), batch_spec, P()),
        out_specs=batch_spec,
        # pallas out_shapes carry no vma info; skip the varying-axes check
        check_vma=False)
    return jax.jit(sharded)
