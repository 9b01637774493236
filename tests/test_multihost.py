"""Multi-host exercise: 2 real processes through jax.distributed.

Validates initialize_distributed (the reference's MPI+NCCL rendezvous
replacement, ref guided_diffusion/dist_util.py:29-50), host-sharded
load_data, and one jitted defended step over a global ('data','eot') mesh
spanning both processes (2 virtual CPU devices each).
"""
import os
import pickle
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture
def cifar_fixture(tmp_path):
    d = tmp_path / "dataset" / "cifar-10-batches-py"
    d.mkdir(parents=True)
    rng = np.random.RandomState(0)
    data = (rng.rand(64, 3072) * 255).astype(np.uint8)
    labels = rng.randint(0, 10, 64).tolist()
    with open(d / "test_batch", "wb") as f:
        pickle.dump({b"data": data, b"labels": labels}, f)
    return str(tmp_path / "dataset")


def test_two_process_defended_step(cifar_fixture):
    # bounded by the communicate(timeout=400) below
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    coordinator = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    # the parent's XLA_FLAGS (8 virtual devices) must not leak: the worker
    # sets its own count before importing jax
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(os.path.abspath(worker))),
         env.get("PYTHONPATH", "")])

    procs = [subprocess.Popen(
        [sys.executable, worker, coordinator, "2", str(pid), cifar_fixture],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for pid in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=400)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"

    def grab(tag, out):
        lines = [ln for ln in out.splitlines() if ln.startswith(tag)]
        assert lines, f"missing {tag} in:\n{out}"
        return lines[-1]

    # 4 global devices visible to both processes
    for out in outs:
        assert grab("DEVICES", out) == "DEVICES global=4 local=2"

    # disjoint, deterministic data shards (subset[i::n] protocol)
    shard0 = grab("SHARD", outs[0])
    shard1 = grab("SHARD", outs[1])
    assert shard0 != shard1

    # both processes computed the same global defended checksum
    c0 = float(grab("CHECKSUM", outs[0]).split()[1])
    c1 = float(grab("CHECKSUM", outs[1]).split()[1])
    assert c0 == c1
    assert np.isfinite(c0)
