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


# ---------------------------------------------------------------------------
# --parity-ratings: the reference's exact per-slot rating table
# (eval.rs:591-644) behind a flag, merged table stays the default
# ---------------------------------------------------------------------------
def _scripted_stats():
    """3 slots over 3-player games; slot 1 dominates, slot 2 always last."""
    stats = EvalStats(["ckptA", "ckptA", "Random"], 3)
    perms = [(0, 1, 2), (1, 2, 0), (2, 0, 1)]
    for g in range(30):
        perm = perms[g % 3]  # seat -> slot
        # placement by slot: slot1 first, slot0 second, slot2 third
        place_of_slot = {1: 1, 0: 2, 2: 3}
        placements = [place_of_slot[perm[seat]] for seat in range(3)]
        rewards = [1.0 - (p - 1) for p in placements]
        stats.record_game(list(perm), placements, rewards)
    return stats


def test_parity_ratings_per_slot_anchor_and_order():
    stats = _scripted_stats()
    result, n_rated = stats.compute_parity_ratings()
    # ALL games rate (no multi-seat skip: every slot sits exactly once).
    assert n_rated == 30
    ratings = [r.rating for r in result.ratings]
    # Anchor = slot 0 at 1000 exactly (reference anchors index 0).
    assert ratings[0] == pytest.approx(1000.0)
    # Duplicate names are NOT merged: slot 1 (same name as slot 0)
    # rates strictly higher; slot 2 strictly lower.
    assert ratings[1] > ratings[0] > ratings[2]
    # Non-anchor uncertainties are per-slot sigmas (positive); the
    # anchor is pinned, so its sigma is 0 by construction.
    assert result.ratings[0].uncertainty == pytest.approx(0.0)
    assert all(r.uncertainty > 0 for r in result.ratings[1:])


def test_parity_ratings_seat_slot_inversion():
    """Placements must be remapped seat -> slot via the permutation
    (eval.rs:1812-1820): the same game set recorded under rotated seats
    yields the same per-slot ratings as identity seating."""
    a = EvalStats(["x", "y"], 2)
    b = EvalStats(["x", "y"], 2)
    for g in range(20):
        # slot 0 always wins
        a.record_game([0, 1], [1, 2], [1.0, -1.0])  # identity seats
        b.record_game([1, 0], [2, 1], [-1.0, 1.0])  # swapped seats
    ra, na = a.compute_parity_ratings()
    rb, nb = b.compute_parity_ratings()
    assert na == nb == 20
    for pa, pb in zip(ra.ratings, rb.ratings):
        assert pa.rating == pytest.approx(pb.rating)
        assert pa.uncertainty == pytest.approx(pb.uncertainty)


def test_parity_ratings_printed_behind_flag(capsys):
    stats = _scripted_stats()
    stats.print_table()  # default: merged table, no parity block
    out_default = capsys.readouterr().out
    assert "<- strongest" not in out_default
    stats.print_table(parity_ratings=True)
    out_parity = capsys.readouterr().out
    assert "Rating computation:" in out_parity
    assert "<- strongest" in out_parity
    # One rating line per SLOT, +/- one sigma formatting.
    assert out_parity.count("ckptA:") == 2


def test_eval_cli_exposes_parity_flag():
    from burn_ppo_tpu.cli import build_parser

    args = build_parser().parse_args(
        ["eval", "--random", "-e", "cartpole", "--parity-ratings"]
    )
    assert args.parity_ratings is True


def test_watch_mode_rotates_seats_between_games(capsys):
    """Watch mode cycles seat assignments per game (reference watch
    loop rotates; repo previously pinned sources[p % S] for all games)."""
    import dataclasses

    from burn_ppo_tpu.eval import run_watch_mode

    env = make_env("connect_four")
    a = dataclasses.replace(PlayerSource.random(), name="A")
    b = dataclasses.replace(PlayerSource.random(), name="B")
    run_watch_mode(
        env, [a, b], num_games=2,
        temp=TempSchedule(initial=1.0, final_temp=1.0, cutoff=None),
        seed=0,
    )
    out = capsys.readouterr().out
    assert "Seats: P0=A, P1=B" in out
    assert "Seats: P0=B, P1=A" in out


def test_eval_stats_single_player_no_draws():
    """P=1 episodes have no draw concept — the sole player is always
    'placed 1st'; counting them would report a 100% draw rate."""
    stats = EvalStats(["solo"], 1)
    stats.record_game([0], [1], [100.0])
    stats.record_game([0], [1], [200.0])
    assert stats.total_games == 2
    assert stats.draws == 0


def test_stats_mode_lineup_covers_all_ordered_pairs():
    """S > P must use ALL ordered arrangements so every source pair meets
    in every seat order (a cyclic lineup never pits pair (0,2) for S=4,
    P=2 and always gives the lower index the first move). Exercised
    end-to-end with 4 Random sources on Connect Four: with 12
    arrangements staggered over the envs and enough games, every source
    plays both seats against every other."""
    from burn_ppo_tpu.envs import make_env
    from burn_ppo_tpu.eval import PlayerSource, run_stats_mode

    env = make_env("connect_four")
    sources = [PlayerSource.random() for _ in range(4)]
    for i, s in enumerate(sources):
        object.__setattr__(s, "name", f"R{i}")
    stats = run_stats_mode(
        env, sources, num_games=48, num_envs=12, seed=0, quiet=True
    )
    assert stats.total_games >= 48
    # Every source saw games in both seats (placements recorded for all).
    for s in range(4):
        assert stats.games[s] > 0
    # Ordered-pair coverage across the recorded games.
    seen = set()
    for rec in stats.game_records:
        srcs = [src for src, _ in rec]
        seen.add(tuple(srcs))
    assert seen == {
        (a, b) for a in range(4) for b in range(4) if a != b
    }
