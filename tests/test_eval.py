"""Eval engine tests (reference eval.rs tests: temp schedules, stats)."""

import jax
import numpy as np
import pytest

from burn_ppo_tpu.config import Config
from burn_ppo_tpu.envs import make_env
from burn_ppo_tpu.eval import (
    EvalStats,
    PlayerSource,
    TempSchedule,
    generate_permutations,
    run_stats_mode,
)
from burn_ppo_tpu.schedule import Schedule
from burn_ppo_tpu.train import Trainer
from burn_ppo_tpu.utils import rewards_to_placements


class _Args:
    temp = None
    temp_final = None
    temp_cutoff = None
    temp_decay = False
    no_temp_cutoff = False


def test_temp_schedule_env_defaults():
    env = make_env("connect_four")
    ts = TempSchedule.from_args(env, _Args())
    assert ts.initial == pytest.approx(0.4)
    assert ts.cutoff == 10
    assert ts.final_temp == 0.0
    assert float(ts.get_temp(0)) == pytest.approx(0.4)
    assert float(ts.get_temp(9)) == pytest.approx(0.4)  # hard cutoff
    assert float(ts.get_temp(10)) == 0.0


def test_temp_schedule_decay():
    ts = TempSchedule(initial=1.0, final_temp=0.0, cutoff=10, decay=True)
    assert float(ts.get_temp(0)) == pytest.approx(1.0)
    assert float(ts.get_temp(5)) == pytest.approx(0.5)
    assert float(ts.get_temp(10)) == 0.0
    assert float(ts.get_temp(20)) == 0.0


def test_temp_schedule_no_cutoff_requires():
    env = make_env("cartpole")  # no env cutoff default
    args = _Args()
    args.temp_final = 0.5
    with pytest.raises(ValueError):
        TempSchedule.from_args(env, args)


def test_generate_permutations():
    perms = generate_permutations(3)
    assert perms.shape == (6, 3)
    assert len({tuple(p) for p in perms.tolist()}) == 6


def test_rewards_to_placements():
    assert rewards_to_placements([1.0, -1.0]) == [1, 2]
    assert rewards_to_placements([-1.0, 1.0]) == [2, 1]
    assert rewards_to_placements([0.0, 0.0]) == [1, 1]
    assert rewards_to_placements([1.0, 0.3, 0.3, -1.0]) == [1, 2, 2, 4]


def test_eval_stats_recording():
    stats = EvalStats(["a", "b"], 2)
    stats.record_game([0, 1], [1, 2], [1.0, -1.0])
    stats.record_game([1, 0], [1, 2], [1.0, -1.0])
    rows = stats.summary_rows()
    assert rows[0]["games"] == 2
    assert rows[0]["win_rate"] == pytest.approx(0.5)
    assert stats.total_games == 2


@pytest.fixture(scope="module")
def trained_c4_checkpoint(tmp_path_factory):
    d = tmp_path_factory.mktemp("c4")
    cfg = Config(
        env="connect_four", num_envs=4, num_steps=16, total_steps=128,
        hidden_size=16, num_hidden=1, checkpoint_freq=128, log_freq=64,
        seed=11, opponent_pool_fraction=0.0,
        learning_rate=Schedule.constant(1e-3),
    )
    t = Trainer(cfg, d / "run", quiet=True)
    t.train()
    return (d / "run" / "checkpoints" / "latest").resolve()


def test_stats_mode_checkpoint_vs_random(trained_c4_checkpoint):
    env = make_env("connect_four")
    sources = [PlayerSource.checkpoint(trained_c4_checkpoint), PlayerSource.random()]
    stats = run_stats_mode(
        env, sources, num_games=20, num_envs=8, seed=0, quiet=True,
        chunk_steps=32,
    )
    assert stats.total_games >= 20
    rows = stats.summary_rows()
    assert rows[0]["games"] + rows[1]["games"] == 2 * stats.total_games
    # both sources got both seats via permutation rotation
    assert rows[0]["games"] == stats.total_games
    for rec in stats.game_records:
        assert sorted(s for s, _ in rec) == [0, 1]


def test_stats_mode_selfplay_broadcast(trained_c4_checkpoint):
    env = make_env("connect_four")
    sources = [PlayerSource.checkpoint(trained_c4_checkpoint)]
    stats = run_stats_mode(
        env, sources, num_games=10, num_envs=4, seed=0, quiet=True, chunk_steps=32
    )
    assert stats.total_games >= 10
    assert stats.games[0] == 2 * stats.total_games  # both seats
