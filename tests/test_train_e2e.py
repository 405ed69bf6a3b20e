"""End-to-end training smoke tests (mirrors reference tests/e2e.rs, which
trains tiny configs: 2 envs x 8 steps x 64 total steps, 16-wide net)."""

import json
from pathlib import Path

import numpy as np
import pytest

from burn_ppo_tpu.config import Config
from burn_ppo_tpu.schedule import Schedule
from burn_ppo_tpu.train import Trainer


def tiny_config(**kw) -> Config:
    base = dict(
        env="cartpole",
        num_envs=2,
        num_steps=8,
        total_steps=64,
        hidden_size=16,
        num_hidden=1,
        learning_rate=Schedule.constant(1e-3),
        checkpoint_freq=32,
        log_freq=16,
        seed=42,
        opponent_pool_fraction=0.0,
    )
    base.update(kw)
    return Config(**base)


def test_training_creates_run_artifacts(tmp_path):
    cfg = tiny_config()
    trainer = Trainer(cfg, tmp_path / "run", quiet=True)
    summary = trainer.train()
    run = tmp_path / "run"
    assert (run / "config.toml").exists()
    assert (run / "metrics.jsonl").exists()
    ckpts = run / "checkpoints"
    assert (ckpts / "latest").exists()
    assert summary["final_step"] >= 64

    # metrics format parity: hparams row + scalar rows
    lines = [json.loads(l) for l in (run / "metrics.jsonl").read_text().splitlines()]
    assert lines[0]["type"] == "hparams"
    scalar_names = {l["name"] for l in lines if l["type"] == "scalar"}
    assert "train/policy_loss" in scalar_names
    assert "perf/sps" in scalar_names


def test_checkpoint_metadata_structure(tmp_path):
    cfg = tiny_config()
    trainer = Trainer(cfg, tmp_path / "run", quiet=True)
    trainer.train()
    latest = (tmp_path / "run" / "checkpoints" / "latest").resolve()
    meta = json.loads((latest / "metadata.json").read_text())
    for key in (
        "step",
        "obs_dim",
        "action_count",
        "hidden_size",
        "num_hidden",
        "activation",
        "network_type",
        "env_name",
        "num_players",
    ):
        assert key in meta
    assert meta["env_name"] == "cartpole"
    assert meta["obs_dim"] == 5
    assert (latest / "model.npz").exists()
    assert (latest / "optimizer.npz").exists()
    assert (latest / "return_norm.npz").exists()
    assert (latest / "rng_state.npz").exists()


def test_resume_continues_from_step(tmp_path):
    cfg = tiny_config()
    t1 = Trainer(cfg, tmp_path / "run", quiet=True)
    t1.train()
    latest = (tmp_path / "run" / "checkpoints" / "latest").resolve()

    cfg2 = tiny_config(total_steps=128)
    t2 = Trainer(cfg2, tmp_path / "run", resume_from=latest, quiet=True)
    assert t2.global_step >= 64
    summary = t2.train()
    assert summary["final_step"] >= 128


def test_resume_restores_params_exactly(tmp_path):
    import jax

    cfg = tiny_config()
    t1 = Trainer(cfg, tmp_path / "run", quiet=True)
    t1.train()
    latest = (tmp_path / "run" / "checkpoints" / "latest").resolve()
    t2 = Trainer(cfg, tmp_path / "run2", resume_from=latest, quiet=True)
    for a, b in zip(
        jax.tree_util.tree_leaves(t1.state.params),
        jax.tree_util.tree_leaves(t2.state.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_normalize_obs_training(tmp_path):
    cfg = tiny_config(normalize_obs=True)
    trainer = Trainer(cfg, tmp_path / "run", quiet=True)
    trainer.train()
    assert trainer.state.obs_norm is not None
    assert float(trainer.state.obs_norm.count) > 0


def test_popart_training(tmp_path):
    cfg = tiny_config(normalize_values=True)
    trainer = Trainer(cfg, tmp_path / "run", quiet=True)
    trainer.train()
    assert trainer.state.popart is not None
    assert float(trainer.state.popart.count) > 0


def test_target_kl_and_clip_value(tmp_path):
    cfg = tiny_config(target_kl=0.02, clip_value=True)
    trainer = Trainer(cfg, tmp_path / "run", quiet=True)
    summary = trainer.train()
    assert summary["final_step"] >= 64


def test_fork_enabling_normalization_keeps_fresh_state(tmp_path, capsys):
    """Forking from a parent trained WITHOUT normalize_obs while enabling
    it must keep the fresh normalizer (and warn) — not silently disable
    the feature because the parent checkpoint has no obs_norm.npz."""
    cfg = tiny_config()  # normalize_obs off
    t1 = Trainer(cfg, tmp_path / "run", quiet=True)
    t1.train()
    latest = (tmp_path / "run" / "checkpoints" / "latest").resolve()

    cfg2 = tiny_config(normalize_obs=True, total_steps=128)
    t2 = Trainer(cfg2, tmp_path / "run2", resume_from=latest)
    captured = capsys.readouterr()
    assert "obs_norm" in captured.out
    assert t2.state.obs_norm is not None
    t2.train()
    assert t2.state.obs_norm is not None
    # The new run's checkpoints are internally consistent: metadata says
    # normalize_obs AND the component file exists.
    latest2 = (tmp_path / "run2" / "checkpoints" / "latest").resolve()
    meta = json.loads((latest2 / "metadata.json").read_text())
    assert meta["normalize_obs"] is True
    assert (latest2 / "obs_norm.npz").exists()


def test_restore_without_rng_state_uses_distinct_update_stream(tmp_path):
    """A checkpoint missing rng_state.npz must not alias the PPO
    epoch-shuffle stream to the rollout sampling stream."""
    import jax

    cfg = tiny_config()
    t1 = Trainer(cfg, tmp_path / "run", quiet=True)
    t1.train()
    latest = (tmp_path / "run" / "checkpoints" / "latest").resolve()
    (latest / "rng_state.npz").unlink()

    t2 = Trainer(cfg, tmp_path / "run2", resume_from=latest, quiet=True)
    assert not np.array_equal(
        np.asarray(t2.state.update_key), np.asarray(t2.state.carry.key)
    )
