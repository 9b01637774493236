"""Worker process for the 2-process jax.distributed test.

Run by tests/test_multihost.py: each process initializes the distributed
runtime through diffpure_tpu.parallel.initialize_distributed (the
MPI+NCCL-init replacement, ref guided_diffusion/dist_util.py:29-50), loads
its host-local data shard, builds the global ('data','eot') mesh, and runs
one jitted defended purify+classify step over a globally-sharded batch.
Prints machine-checkable lines the parent asserts on.

Usage: python multihost_worker.py <coordinator> <num_procs> <pid> <dataroot>
"""
import os
import sys

# 2 virtual CPU devices per process -> 4 global devices
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    coordinator, num_procs, pid, dataroot = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])

    from diffpure_tpu.parallel import initialize_distributed, make_mesh, \
        replicate
    initialize_distributed(coordinator_address=coordinator,
                           num_processes=num_procs, process_id=pid)
    assert jax.process_count() == num_procs, jax.process_count()
    assert jax.process_index() == pid
    n_global = jax.device_count()
    print(f"DEVICES global={n_global} local={jax.local_device_count()}",
          flush=True)

    # host-sharded data loading: identical subset indices on every host,
    # process i keeps subset[i::n] (data/datasets.py:193-216)
    from diffpure_tpu.data import load_data
    x_np, y_np = load_data("cifar10", num_sub=8, data_seed=0, root=dataroot,
                           shard=pid, num_shards=num_procs)
    print(f"SHARD labels={list(map(int, y_np))}", flush=True)

    # one defended step over the global mesh
    from jax.sharding import NamedSharding, PartitionSpec as P
    from diffpure_tpu.models.ncsnpp import NCSNpp
    from diffpure_tpu.purify import PurifyConfig, purify

    mesh = make_mesh(data=n_global, eot=1)
    sharding = NamedSharding(mesh, P(("data", "eot")))

    model = NCSNpp(image_size=32, nf=16, ch_mult=(1, 2), num_res_blocks=1,
                   attn_resolutions=(16,), num_scales=100)
    key = jax.random.PRNGKey(0)
    params = model.init(key, jnp.zeros((1, 32, 32, 3)), jnp.zeros((1,)))
    params = replicate(params, mesh)

    x_global = jax.make_array_from_process_local_data(
        sharding, np.asarray(x_np, np.float32))
    assert x_global.shape[0] == 8  # 4 local x 2 processes

    cfg = PurifyConfig(diffusion_type="sde", t=4, score_type="score_sde",
                       grad_mode="none")

    @jax.jit
    def defended(params, x01, k):
        x = (x01 - 0.5) * 2.0
        xp = purify(lambda p, xx, tt: model.apply(p, xx, tt),
                    params, x, k, cfg)
        # global-mean logit proxy: forces a cross-host collective
        return jnp.mean(xp ** 2)

    out = float(defended(params, x_global, jax.random.fold_in(key, 1)))
    print(f"CHECKSUM {out:.10f}", flush=True)


if __name__ == "__main__":
    main()
