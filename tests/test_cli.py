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


def test_cli_loads_real_score_checkpoint(workdir, monkeypatch):
    """End-to-end CLI with a reference-generated checkpoint_8.pth: a small
    config yaml drives ncsnpp_from_config (the create_model(config)
    equivalent), and the real score_sde file-loading path runs instead of
    --random_weights."""
    import sys
    import torch
    sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
    import reference_oracle as ro
    from test_checkpoint_fidelity import _ema_train_steps, SMALL_NCSN

    # small config yaml matching SMALL_NCSN
    cfg_path = os.path.join("configs", "cifar10.yml")
    with open(cfg_path) as f:
        cfg_text = f.read()
    cfg_text = (cfg_text
                .replace("nf: 128", "nf: 32")
                .replace("num_res_blocks: 8", "num_res_blocks: 2")
                .replace("ch_mult: [1, 2, 2, 2]", "ch_mult: [1, 2]")
                .replace("attn_resolutions: [16]", "attn_resolutions: [8]")
                .replace("image_size: 32", "image_size: 16"))
    with open(os.path.join("configs", "small.yml"), "w") as f:
        f.write(cfg_text)

    torch.manual_seed(0)
    ref = ro.load_reference_ncsnpp(ro.cifar10_ref_config(**SMALL_NCSN))
    ema = _ema_train_steps(ref)
    opt = torch.optim.Adam(ref.parameters(), lr=2e-4)
    os.makedirs("pretrained/score_sde", exist_ok=True)
    torch.save(dict(optimizer=opt.state_dict(), model=ref.state_dict(),
                    ema=ema.state_dict(), step=8),
               "pretrained/score_sde/checkpoint_8.pth")

    from diffpure_tpu import cli
    results = cli.main([
        "--config", "small.yml",
        "--domain", "cifar10",
        "--classifier_name", "cifar10-wideresnet-28-10",
        "--diffusion_type", "sde",
        "--score_type", "score_sde",
        "--attack_version", "custom",
        "--t", "2",
        "--num_sub", "2",
        "--adv_eps", "0.031373",
    ])
    assert "defended_robust_acc" in results
    # the run dir log must NOT contain the missing-checkpoint fallback
    log_dir = os.path.join("exp", "images", "cifar10-wideresnet-28-10",
                           "sde_custom", "seed1234", "data0")
    with open(os.path.join(log_dir, "log.txt")) as f:
        log = f.read()
    assert "checkpoint_8.pth missing" not in log
