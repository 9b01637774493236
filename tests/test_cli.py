"""End-to-end CLI smoke test: full-size models, tiny budgets, random weights."""
import os
import pickle

import numpy as np
import pytest


@pytest.fixture
def workdir(tmp_path, rng, monkeypatch):
    d = tmp_path / "dataset" / "cifar-10-batches-py"
    d.mkdir(parents=True)
    data = (rng.rand(64, 3072) * 255).astype(np.uint8)
    labels = rng.randint(0, 10, 64).tolist()
    with open(d / "test_batch", "wb") as f:
        pickle.dump({b"data": data, b"labels": labels}, f)
    cfg_dir = tmp_path / "configs"
    cfg_dir.mkdir()
    repo_cfg = os.path.join(os.path.dirname(__file__), "..", "configs",
                            "cifar10.yml")
    cfg = (cfg_dir / "cifar10.yml")
    with open(repo_cfg) as f:
        cfg.write_text(f.read())
    monkeypatch.chdir(tmp_path)
    return tmp_path


def test_cli_cifar_smoke(workdir):
    """Full pipeline: config parse, model build, data load, purify+classify,
    attack driver — with random weights, t=2, 2 examples, 2 APGD iters."""
    import sys
    from diffpure_tpu import cli

    saved_out, saved_err = sys.stdout, sys.stderr
    try:
        results = cli.main([
            "--config", "cifar10.yml",
            "--domain", "cifar10",
            "--classifier_name", "cifar10-wideresnet-28-10",
            "--diffusion_type", "sde",
            "--score_type", "score_sde",
            "--attack_version", "custom",
            "--t", "2",
            "--num_sub", "2",
            "--adv_eps", "0.031373",
            "--random_weights",
        ])
    finally:
        sys.stdout, sys.stderr = saved_out, saved_err
    assert "classifier_robust_acc" in results
    assert "defended_robust_acc" in results
    log_dir = os.path.join("exp", "images", "cifar10-wideresnet-28-10",
                           "sde_custom", "seed1234", "data0")
    assert os.path.exists(os.path.join(log_dir, "log.txt"))
