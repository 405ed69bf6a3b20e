"""Opponent-pool selection/EMA property tests mirroring the reference's
numerical-stability suite (opponent_pool.rs:1089-1348): selection
probabilities at win_rate ∈ {0, 1}, large exponents, EMA bounds and
convergence."""

import numpy as np
import pytest

from burn_ppo_tpu.selfplay.opponent_pool import OpponentPool, OpponentStats


def mk_pool(run_dir, alpha=0.1, exponent=2.0, max_active=8, seed=0):
    run_dir.mkdir(parents=True, exist_ok=True)
    return OpponentPool(
        run_dir, select_alpha=alpha, select_exponent=exponent,
        max_active=max_active, seed=seed,
    )


def set_stats(pool, rates):
    for i, wr in enumerate(rates):
        name = f"step_{i:08d}"
        pool.stats[name] = OpponentStats(name=name, step=i, win_rate=wr)
    return list(pool.stats)


def probs(pool):
    w = pool.selection_weights()
    total = sum(w.values())
    return {k: v / total for k, v in w.items()}


# ------------------------------------------------------------ selection
def test_selection_probability_exponent_2(tmp_path):
    # (1-wr)^2: wr 0.0 vs 0.5 -> weights 1.0 vs 0.25 (rs:1180).
    pool = mk_pool(tmp_path / "a", exponent=2.0)
    names = set_stats(pool, [0.0, 0.5])
    w = pool.selection_weights()
    assert w[names[0]] == pytest.approx(1.0)
    assert w[names[1]] == pytest.approx(0.25)


def test_selection_probability_uniform_win_rates(tmp_path):
    pool = mk_pool(tmp_path / "a")
    names = set_stats(pool, [0.5] * 6)
    p = probs(pool)
    for n in names:
        assert p[n] == pytest.approx(1.0 / 6.0)


def test_selection_probability_edge_win_rate_1(tmp_path):
    # An opponent the learner always beats (wr=1 means OPPONENT always
    # wins? no: wr is the opponent's rate; wr=1 -> hardest) — the
    # reference floors (1-wr) at 1e-6 so weight stays positive & finite.
    pool = mk_pool(tmp_path / "a", exponent=2.0)
    names = set_stats(pool, [1.0, 0.5])
    w = pool.selection_weights()
    assert 0.0 < w[names[0]] <= w[names[1]]
    p = probs(pool)
    assert all(np.isfinite(v) for v in p.values())


def test_win_rate_exactly_zero_dominates_selection(tmp_path):
    pool = mk_pool(tmp_path / "a", exponent=2.0)
    names = set_stats(pool, [0.0, 0.9, 0.9, 0.9])
    p = probs(pool)
    assert p[names[0]] > 0.9


def test_selection_probability_sums_to_one(tmp_path):
    rng = np.random.default_rng(0)
    pool = mk_pool(tmp_path / "a", exponent=3.0)
    set_stats(pool, rng.random(17).tolist())
    assert sum(probs(pool).values()) == pytest.approx(1.0)


def test_selection_probability_ordering(tmp_path):
    # Lower opponent win rate -> strictly higher selection weight.
    pool = mk_pool(tmp_path / "a", exponent=2.0)
    names = set_stats(pool, [0.1, 0.3, 0.5, 0.7, 0.9])
    w = pool.selection_weights()
    vals = [w[n] for n in names]
    assert vals == sorted(vals, reverse=True)


@pytest.mark.parametrize("exponent", [1.0, 2.0, 10.0, 50.0])
def test_no_nan_in_probabilities_large_exponent(tmp_path, exponent):
    pool = mk_pool(tmp_path / "a", exponent=exponent)
    set_stats(pool, [0.0, 0.25, 0.5, 0.75, 1.0])
    p = probs(pool)
    assert all(np.isfinite(v) and v >= 0 for v in p.values())
    assert sum(p.values()) == pytest.approx(1.0)


def test_large_exponent_prefers_weakest_sharply(tmp_path):
    pool = mk_pool(tmp_path / "a", exponent=50.0)
    names = set_stats(pool, [0.4, 0.5])
    p = probs(pool)
    # (0.6/0.5)^50 ~ 9100x preference
    assert p[names[0]] > 0.999


def test_sample_active_without_replacement(tmp_path):
    pool = mk_pool(tmp_path / "a", max_active=4)
    names = set_stats(pool, [0.2, 0.4, 0.6, 0.8, 0.5, 0.5])
    chosen = pool.sample_active()
    assert len(chosen) == 4
    assert len(set(chosen)) == 4
    assert set(chosen) <= set(names)


def test_sample_active_all_when_fewer_than_max(tmp_path):
    pool = mk_pool(tmp_path / "a", max_active=8)
    names = set_stats(pool, [0.5, 0.5])
    assert sorted(pool.sample_active()) == sorted(names)


def test_sample_active_zero_total_weight_fallback(tmp_path):
    # All wr == 1.0 -> tiny but positive weights; sampling must still
    # return k distinct opponents.
    pool = mk_pool(tmp_path / "a", max_active=3, exponent=2.0)
    set_stats(pool, [1.0, 1.0, 1.0, 1.0])
    chosen = pool.sample_active()
    assert len(chosen) == 3 and len(set(chosen)) == 3


# ---------------------------------------------------------------- EMA
def test_win_rate_ema_basic(tmp_path):
    pool = mk_pool(tmp_path / "a", alpha=0.1)
    names = set_stats(pool, [0.5])
    pool.queue_game_result([names[0]], 2, [1])  # opponent beat learner
    pool.apply_pending_updates()
    # win_rate is the LEARNER's (opponent_pool.rs:40): a loss blends 0.0.
    assert pool.stats[names[0]].win_rate == pytest.approx(
        0.5 * 0.9 + 0.0 * 0.1
    )


def test_win_rate_ema_alpha_one_jumps_to_batch(tmp_path):
    pool = mk_pool(tmp_path / "a", alpha=1.0)
    names = set_stats(pool, [0.5])
    pool.queue_game_result([names[0]], 1, [2])  # learner won
    pool.apply_pending_updates()
    assert pool.stats[names[0]].win_rate == pytest.approx(1.0)


def test_win_rate_empty_rotation_no_change(tmp_path):
    pool = mk_pool(tmp_path / "a", alpha=0.5)
    names = set_stats(pool, [0.42])
    pool.apply_pending_updates()  # nothing queued
    assert pool.stats[names[0]].win_rate == pytest.approx(0.42)
    assert pool.stats[names[0]].games_played == 0


def test_win_rate_convergence_to_true_rate(tmp_path):
    # A constant 25% learner win rate converges to win_rate = 0.25.
    pool = mk_pool(tmp_path / "a", alpha=0.2)
    names = set_stats(pool, [0.5])
    for _ in range(60):
        for _ in range(3):
            pool.queue_game_result([names[0]], 2, [1])  # opp wins
        pool.queue_game_result([names[0]], 1, [2])  # learner wins
        pool.apply_pending_updates()
    assert pool.stats[names[0]].win_rate == pytest.approx(0.25, abs=0.02)


def test_win_rate_bounds_under_extremes(tmp_path):
    pool = mk_pool(tmp_path / "a", alpha=0.9)
    names = set_stats(pool, [0.5])
    for _ in range(50):
        pool.queue_game_result([names[0]], 2, [1])  # learner keeps losing
        pool.apply_pending_updates()
    assert 0.0 <= pool.stats[names[0]].win_rate <= 1.0
    assert pool.stats[names[0]].win_rate < 0.01


def test_batch_ema_counts_games(tmp_path):
    pool = mk_pool(tmp_path / "a", alpha=0.1)
    names = set_stats(pool, [0.5, 0.5])
    pool.queue_game_results_batch(
        names,
        np.asarray([1, 2, 3]),
        np.asarray([[0, 1], [0, 1], [1, 0]]),
        np.asarray([[2, 3], [1, 1], [2, 1]]),
    )
    pool.apply_pending_updates()
    assert pool.stats[names[0]].games_played == 3
    assert pool.stats[names[1]].games_played == 3
