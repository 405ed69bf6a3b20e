"""Multiplayer (self-play) training smoke tests — Connect Four."""

import json

import numpy as np

from burn_ppo_tpu.config import Config
from burn_ppo_tpu.schedule import Schedule
from burn_ppo_tpu.train import Trainer


def c4_config(**kw) -> Config:
    base = dict(
        env="connect_four",
        num_envs=4,
        num_steps=16,
        total_steps=256,
        hidden_size=32,
        num_hidden=1,
        learning_rate=Schedule.constant(1e-3),
        checkpoint_freq=128,
        log_freq=64,
        seed=7,
        opponent_pool_fraction=0.0,
    )
    base.update(kw)
    return Config(**base)


def test_connect_four_selfplay_trains(tmp_path):
    trainer = Trainer(c4_config(), tmp_path / "run", quiet=True)
    summary = trainer.train()
    assert summary["final_step"] >= 256
    # multiplayer per-player metrics present
    lines = [
        json.loads(l) for l in (tmp_path / "run" / "metrics.jsonl").read_text().splitlines()
    ]
    names = {l["name"] for l in lines if l["type"] == "scalar"}
    assert "episode/player_0_points" in names
    assert "episode/draw_rate" in names


def test_connect_four_cnn_trains(tmp_path):
    cfg = c4_config(network_type="cnn", activation="relu")
    trainer = Trainer(cfg, tmp_path / "run", quiet=True)
    summary = trainer.train()
    assert summary["final_step"] >= 256
    meta = json.loads(
        (tmp_path / "run" / "checkpoints" / "latest" / "metadata.json").read_text()
    )
    assert meta["network_type"] == "cnn"
    assert meta["obs_shape"] == [6, 7, 2]


def test_outcomes_are_valid_placements(tmp_path):
    trainer = Trainer(c4_config(), tmp_path / "run", quiet=True)
    trainer.train()
    tr = trainer.tracker
    assert tr.has_data
    pts = tr.avg_points()
    # Two-player zero-sum Swiss points: each game awards 1 total (win 1 /
    # loss 0, draw 0.5 each), so per-player averages lie in [0, 1] and
    # sum to 1.
    assert 0.0 <= pts[0] <= 1.0 and 0.0 <= pts[1] <= 1.0
    assert abs(pts[0] + pts[1] - 1.0) < 1e-6
    assert 0.0 <= tr.draw_rate <= 1.0
