"""Device mesh and sharding for batch x EOT parallelism.

The reference's entire parallelism surface is single-host DataParallel plus
EOT reps folded into the batch (SURVEY.md §2.6). The TPU-native equivalent:
a 2-D ('data', 'eot') mesh; the defended forward is jit-compiled with batch
sharded over 'data' and EOT replicas over 'eot'; XLA emits all-reduces over
ICI for the EOT gradient mean. No explicit collectives or backend code —
sharding annotations + pjit replace NCCL scatter/gather
(ref eval_sde_adv.py:227-228, guided_diffusion/dist_util.py:29-50).

Multi-host: call initialize_distributed() per process; meshes span all
devices and DCN carries the cross-host axis.
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Array = jax.Array


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host rendezvous (replaces MPI+NCCL init,
    ref dist_util.py:29-50). No-op when single-process."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def make_mesh(data: Optional[int] = None, eot: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """('data', 'eot') mesh over the available devices.

    When asked for more devices than the default platform exposes (e.g. an
    8-device mesh on a 1-chip host), falls back to the virtual CPU platform —
    useful only if xla_force_host_platform_device_count was set before the
    CPU backend initialized (tests/conftest.py recipe).
    """
    if devices is None:
        devices = jax.devices()
        if data is not None and data * eot > len(devices):
            cpu = jax.devices("cpu")
            if len(cpu) >= data * eot:
                # Loud by design: a leftover
                # xla_force_host_platform_device_count flag must not let a
                # TPU benchmark/eval silently run on virtual CPU devices.
                import warnings
                warnings.warn(
                    f"make_mesh: default platform has {len(devices)} "
                    f"device(s) < requested {data}x{eot}; falling back to "
                    f"{data * eot} virtual CPU devices", stacklevel=2)
                devices = cpu[: data * eot]
    n = len(devices)
    if data is None:
        assert n % eot == 0, (n, eot)
        data = n // eot
    assert data * eot == n, (
        f"mesh wants {data}x{eot} devices but only {n} available "
        f"(set XLA_FLAGS=--xla_force_host_platform_device_count before "
        f"backend init for a virtual CPU mesh)")
    dev_array = np.asarray(devices).reshape(data, eot)
    return Mesh(dev_array, axis_names=("data", "eot"))


def shard_batch(x: Array, mesh: Mesh, axis: str = "data") -> Array:
    """Place x with its leading axis sharded over `axis` (others replicated)."""
    spec = P(axis)
    return jax.device_put(x, NamedSharding(mesh, spec))


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (model params) over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sharding), tree)


def eot_fold(x: Array, eot: int) -> Array:
    """Tile the batch for EOT reps: (B, ...) -> (eot*B, ...)
    (ref bpda_eot_attack.py:99 X.repeat)."""
    return jnp.tile(x, (eot,) + (1,) * (x.ndim - 1))


def eot_unfold(v: Array, eot: int) -> Array:
    """(eot*B, ...) -> (eot, B, ...)."""
    return v.reshape((eot, -1) + v.shape[1:])
