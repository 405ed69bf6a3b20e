"""Opponent pool + vs-pool training tests (reference opponent_pool.rs
tests: EMA convergence, selection probability properties; e2e.rs
opponent-pool training)."""

import json

import numpy as np
import pytest

from burn_ppo_tpu.config import Config
from burn_ppo_tpu.schedule import Schedule
from burn_ppo_tpu.selfplay.opponent_pool import OpponentPool, OpponentStats
from burn_ppo_tpu.selfplay.rating_history import RatingHistory
from burn_ppo_tpu.train import Trainer


def make_pool(tmp_path, **kw) -> OpponentPool:
    return OpponentPool(tmp_path, **kw)


def test_ema_win_rate_convergence(tmp_path):
    pool = make_pool(tmp_path, select_alpha=0.1)
    pool.add_checkpoint("step_00000100", 100)
    # opponent always loses to learner -> win rate decays toward 0
    for _ in range(100):
        pool.queue_game_result(["step_00000100"], 1, [2])
        pool.apply_pending_updates()
    assert pool.stats["step_00000100"].win_rate < 0.01
    # always beats learner -> toward 1
    pool.add_checkpoint("step_00000200", 200)
    for _ in range(100):
        pool.queue_game_result(["step_00000200"], 2, [1])
        pool.apply_pending_updates()
    assert pool.stats["step_00000200"].win_rate > 0.99


def test_ema_applied_once_per_rotation(tmp_path):
    pool = make_pool(tmp_path, select_alpha=0.5)
    pool.add_checkpoint("a", 1)
    # 10 games queued in ONE rotation => one EMA step with batch average
    for _ in range(10):
        pool.queue_game_result(["a"], 2, [1])  # opponent wins
    pool.apply_pending_updates()
    assert pool.stats["a"].win_rate == pytest.approx(0.5 * 0.5 + 1.0 * 0.5)
    assert pool.stats["a"].games_played == 10


def test_selection_weights_focus_hard_opponents(tmp_path):
    pool = make_pool(tmp_path, select_exponent=2.0)
    pool.add_checkpoint("weak", 1)
    pool.add_checkpoint("hard", 2)
    pool.stats["weak"].win_rate = 0.1  # learner beats it 90%
    pool.stats["hard"].win_rate = 0.9
    w = pool.selection_weights()
    assert w["hard"] / w["weak"] < 0.05  # (0.1/0.9)^2


def test_selection_weights_numerical_stability(tmp_path):
    pool = make_pool(tmp_path, select_exponent=8.0)
    pool.add_checkpoint("a", 1)
    pool.add_checkpoint("b", 2)
    pool.stats["a"].win_rate = 1.0
    pool.stats["b"].win_rate = 0.0
    w = pool.selection_weights()
    assert np.isfinite(list(w.values())).all()
    assert w["a"] > 0  # floored, never exactly 0


def test_sample_without_replacement(tmp_path):
    pool = make_pool(tmp_path, max_active=3)
    for i in range(10):
        pool.add_checkpoint(f"step_{i:08d}", i)
    active = pool.sample_active()
    assert len(active) == 3
    assert len(set(active)) == 3


def test_stats_persistence_roundtrip(tmp_path):
    pool = make_pool(tmp_path)
    pool.add_checkpoint("x", 5)
    pool.stats["x"].win_rate = 0.7
    pool.save_stats()
    pool2 = make_pool(tmp_path)
    assert pool2.stats["x"].win_rate == pytest.approx(0.7)
    assert pool2.stats["x"].step == 5


def test_rating_history_roundtrip(tmp_path):
    h = RatingHistory(tmp_path)
    h.on_checkpoint_saved("step_00000100", 100)
    h.record_game("step_00000100", ["step_00000100"], [1, 2])
    h.on_checkpoint_saved("step_00000200", 200)
    for _ in range(5):
        h.record_game("step_00000200", ["step_00000100"], [1, 2])
    snap = h.compute()
    assert snap.total_games == 6

    h2 = RatingHistory.load(tmp_path)
    assert len(h2.games) == 6
    assert h2.current_checkpoint == "step_00000200"
    snap2 = h2.compute()
    assert snap2.total_games == 6
    # later checkpoint that always wins rates above the anchored first
    assert snap2.best_elo >= 1000.0


def test_pool_training_e2e(tmp_path):
    """Full vs-pool training loop: checkpoints join the pool, rating
    games accumulate, opponent stats update (e2e.rs opponent tests)."""
    cfg = Config(
        env="connect_four",
        num_envs=8,
        num_steps=16,
        total_steps=1024,
        hidden_size=16,
        num_hidden=1,
        learning_rate=Schedule.constant(1e-3),
        checkpoint_freq=256,
        log_freq=128,
        seed=3,
        opponent_pool_fraction=0.5,
        max_active_opponents=2,
    )
    trainer = Trainer(cfg, tmp_path / "run", quiet=True)
    assert trainer.num_learner_envs == 4
    summary = trainer.train()
    assert summary["final_step"] >= 1024

    run = tmp_path / "run"
    assert (run / "opponent_stats.json").exists()
    assert (run / "rating_games.jsonl").exists()
    stats = json.loads((run / "opponent_stats.json").read_text())
    assert len(stats["opponents"]) >= 2
    games = (run / "rating_games.jsonl").read_text().splitlines()
    assert len(games) > 0
    # rating metrics logged
    lines = [json.loads(l) for l in (run / "metrics.jsonl").read_text().splitlines()]
    names = {l["name"] for l in lines if l["type"] == "scalar"}
    assert "train/current_elo" in names
    assert "eval/pool_performance" in names
    # best symlink exists (rating-driven for multiplayer)
    assert (run / "checkpoints" / "best").exists()


def test_debug_opponents_prints_selection(tmp_path, capsys):
    """--debug-opponents logs the rotation's picks with win rates and
    normalized selection probabilities (reference e2e.rs:1213)."""
    cfg = Config(
        env="connect_four",
        num_envs=8,
        num_steps=16,
        total_steps=768,
        hidden_size=16,
        num_hidden=1,
        learning_rate=Schedule.constant(1e-3),
        checkpoint_freq=256,
        log_freq=256,
        seed=5,
        opponent_pool_fraction=0.5,
        max_active_opponents=2,
        debug_opponents=True,
    )
    trainer = Trainer(cfg, tmp_path / "run", quiet=False)
    trainer.train()
    out = capsys.readouterr().out
    assert "[opponents @ step" in out
    assert "wr=" in out and "p=" in out


def test_rating_history_incremental_matches_cold_recompute(tmp_path):
    """The incremental comparison cache (chunks of ComparisonArrays) must
    give bit-identical ratings to a cold load that expands the full game
    log at once, across several append->checkpoint->compute cycles,
    including ties and multi-opponent games."""
    import numpy as np

    rng = np.random.default_rng(7)
    h = RatingHistory(tmp_path)
    names = [f"step_{i:08d}" for i in range(1, 7)]
    for ci, name in enumerate(names):
        h.on_checkpoint_saved(name, (ci + 1) * 100)
        games = []
        for _ in range(20):
            n_opp = int(rng.integers(1, 4))
            opps = [names[int(rng.integers(0, ci + 1))] for _ in range(n_opp)]
            placements = list(rng.integers(1, n_opp + 2, size=n_opp + 1))
            if rng.random() < 0.3:  # force ties regularly
                placements = [1] * (n_opp + 1)
            games.append((opps, placements))
        h.record_games_batch(name, games)
        snap_inc = h.compute()  # exercises the incremental path each cycle
        cold = RatingHistory.load(tmp_path)
        snap_cold = cold.compute()
        assert snap_inc.total_games == snap_cold.total_games
        assert snap_inc.current_elo == snap_cold.current_elo
        assert snap_inc.best_elo == snap_cold.best_elo
        assert snap_inc.best_step == snap_cold.best_step
        np.testing.assert_array_equal(
            np.asarray(h._cached_ratings), np.asarray(cold._cached_ratings)
        )


def test_comparison_arrays_roundtrip():
    from burn_ppo_tpu.selfplay.plackett_luce import (
        GameResult,
        arrays_to_comparisons,
        comparisons_to_arrays,
        concat_comparison_arrays,
        expand_games_to_comparisons,
    )

    games = [
        GameResult.of([0, 1, 2], [1, 1, 3]),  # tie for first
        GameResult.of([2, 3], [2, 1]),
        GameResult.of([0, 1, 2, 3], [4, 3, 2, 1]),
    ]
    comps = expand_games_to_comparisons(games)
    arrays = comparisons_to_arrays(comps)
    back = arrays_to_comparisons(arrays)
    assert len(back) == len(comps)
    for a, b in zip(comps, back):
        assert a.winner == b.winner
        assert a.losers == b.losers
        assert a.weight == b.weight
    # chunked concat == single expansion
    half = comparisons_to_arrays(expand_games_to_comparisons(games[:1]))
    rest = comparisons_to_arrays(expand_games_to_comparisons(games[1:]))
    joined = concat_comparison_arrays([half, rest])
    import numpy as np

    np.testing.assert_array_equal(joined.winners, arrays.winners)
    np.testing.assert_array_equal(joined.counts, arrays.counts)
    np.testing.assert_array_equal(joined.losers, arrays.losers)
    np.testing.assert_array_equal(joined.weights, arrays.weights)
