"""CTDE training smoke tests — Liar's Dice (reference e2e.rs:1285-1466)."""

import json

from burn_ppo_tpu.config import Config
from burn_ppo_tpu.schedule import Schedule
from burn_ppo_tpu.train import Trainer


def ld_config(**kw) -> Config:
    base = dict(
        env="liars_dice",
        num_envs=4,
        num_steps=16,
        total_steps=256,
        hidden_size=16,
        num_hidden=1,
        learning_rate=Schedule.constant(1e-3),
        checkpoint_freq=128,
        log_freq=64,
        seed=13,
        opponent_pool_fraction=0.0,
    )
    base.update(kw)
    return Config(**base)


def test_liars_dice_mlp_trains(tmp_path):
    trainer = Trainer(ld_config(), tmp_path / "run", quiet=True)
    summary = trainer.train()
    assert summary["final_step"] >= 256


def test_liars_dice_ctde_trains(tmp_path):
    cfg = ld_config(network_type="ctde", critic_hidden_size=32, critic_num_hidden=2)
    trainer = Trainer(cfg, tmp_path / "run", quiet=True)
    summary = trainer.train()
    assert summary["final_step"] >= 256
    meta = json.loads(
        (tmp_path / "run" / "checkpoints" / "latest" / "metadata.json").read_text()
    )
    assert meta["network_type"] == "ctde"
    assert meta["privileged_obs_dim"] == 120
    assert meta["critic_hidden_size"] == 32


def test_liars_dice_ctde_resume(tmp_path):
    cfg = ld_config(network_type="ctde")
    t1 = Trainer(cfg, tmp_path / "run", quiet=True)
    t1.train()
    latest = (tmp_path / "run" / "checkpoints" / "latest").resolve()
    cfg2 = ld_config(network_type="ctde", total_steps=512)
    t2 = Trainer(cfg2, tmp_path / "run", resume_from=latest, quiet=True)
    summary = t2.train()
    assert summary["final_step"] >= 512


def test_reward_shaping_schedule_applied(tmp_path):
    cfg = ld_config(reward_shaping_coef=Schedule.of([(0.1, 0), (0.0, 200)]))
    trainer = Trainer(cfg, tmp_path / "run", quiet=True)
    summary = trainer.train()
    assert summary["final_step"] >= 256


def test_liars_dice_with_pool_and_ctde(tmp_path):
    cfg = ld_config(
        network_type="ctde",
        num_envs=8,
        total_steps=768,
        checkpoint_freq=256,
        opponent_pool_fraction=0.5,
        max_active_opponents=2,
    )
    trainer = Trainer(cfg, tmp_path / "run", quiet=True)
    summary = trainer.train()
    assert summary["final_step"] >= 768
    assert (tmp_path / "run" / "rating_games.jsonl").exists()
