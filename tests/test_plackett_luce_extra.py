"""Extended Plackett-Luce tests (reference plackett_luce.rs has 59:
MM convergence, stability, tie handling, CI behavior, anchoring)."""

import numpy as np
import pytest

from burn_ppo_tpu.selfplay.plackett_luce import (
    ELO_SCALE,
    GameResult,
    PlackettLuceConfig,
    PlayerRating,
    compute_ratings,
    elo_to_gamma,
    expand_games_to_comparisons,
    gamma_to_elo,
)


def two_player(w, l, n=1):
    return [GameResult.of([w, l], [1, 2]) for _ in range(n)]


# ------------------------------------------------------- convergence
def test_converges_and_reports_stats():
    games = two_player(0, 1, 10) + two_player(1, 0, 5)
    r = compute_ratings(2, games, 0)
    assert r.stats.converged
    assert 0 < r.stats.iterations_used <= 100
    assert r.stats.final_delta < 1e-6
    assert r.stats.computation_time_ms >= 0.0


def test_max_iterations_respected():
    cfg = PlackettLuceConfig(max_iterations=2)
    games = two_player(0, 1, 50) + two_player(1, 0, 1)
    r = compute_ratings(2, games, 0, cfg)
    assert r.stats.iterations_used <= 2


def test_win_ratio_maps_to_elo_gap():
    """2:1 win ratio -> gamma gap ln(2) -> ~120 Elo."""
    games = two_player(0, 1, 200) + two_player(1, 0, 100)
    r = compute_ratings(2, games, 1)
    gap = r.ratings[0].rating - r.ratings[1].rating
    assert gap == pytest.approx(ELO_SCALE * np.log(2.0), rel=0.05)


def test_anchor_choice_shifts_not_reorders():
    games = (
        two_player(0, 1, 8) + two_player(1, 0, 2)
        + two_player(1, 2, 8) + two_player(2, 1, 2)
    )
    r0 = compute_ratings(3, games, 0)
    r2 = compute_ratings(3, games, 2)
    gaps0 = [x.rating - r0.ratings[0].rating for x in r0.ratings]
    gaps2 = [x.rating - r2.ratings[0].rating for x in r2.ratings]
    np.testing.assert_allclose(gaps0, gaps2, atol=1e-6)
    assert r0.ratings[0].rating == pytest.approx(1000.0)
    assert r2.ratings[2].rating == pytest.approx(1000.0)


def test_extreme_skill_gap_finite():
    """One player never loses across many games: ratings stay finite."""
    games = two_player(0, 1, 500)
    r = compute_ratings(2, games, 1)
    for pr in r.ratings:
        assert np.isfinite(pr.rating)
        assert np.isfinite(pr.uncertainty)
    assert r.ratings[0].rating > r.ratings[1].rating + 200


def test_chain_dominance_transitive_large():
    rng = np.random.default_rng(0)
    n = 8
    games = []
    for i in range(n - 1):
        games += two_player(i, i + 1, 20) + two_player(i + 1, i, 5)
    r = compute_ratings(n, games, n - 1)
    ratings = [x.rating for x in r.ratings]
    assert all(ratings[i] > ratings[i + 1] for i in range(n - 1))


# ------------------------------------------------------- uncertainties
def test_uncertainty_shrinks_with_games():
    few = compute_ratings(2, two_player(0, 1, 4) + two_player(1, 0, 4), 0)
    many = compute_ratings(2, two_player(0, 1, 100) + two_player(1, 0, 100), 0)
    assert many.ratings[1].uncertainty < few.ratings[1].uncertainty


def test_anchor_has_zero_uncertainty():
    r = compute_ratings(2, two_player(0, 1, 10) + two_player(1, 0, 10), 0)
    assert r.ratings[0].uncertainty == 0.0
    assert r.ratings[1].uncertainty > 0.0


def test_ci_inflation_factor_applied():
    games = two_player(0, 1, 20) + two_player(1, 0, 20)
    r1 = compute_ratings(2, games, 0, PlackettLuceConfig(ci_inflation_factor=1.0))
    r2 = compute_ratings(2, games, 0, PlackettLuceConfig(ci_inflation_factor=2.0))
    assert r2.ratings[1].uncertainty == pytest.approx(
        2.0 * r1.ratings[1].uncertainty, rel=1e-6
    )


def test_confidence_interval_accessor():
    pr = PlayerRating(rating=1100.0, uncertainty=50.0)
    lo, hi = pr.confidence_interval()
    assert (lo, hi) == (1000.0, 1200.0)


# ------------------------------------------------------- ties/expansion
def test_tied_pair_rates_equal():
    games = [GameResult.of([0, 1, 2], [1, 1, 3]) for _ in range(30)]
    games += [GameResult.of([2, 0, 1], [1, 2, 2]) for _ in range(10)]
    r = compute_ratings(3, games, 2)
    assert r.ratings[0].rating == pytest.approx(r.ratings[1].rating, abs=1.0)


def test_single_player_games_ignored():
    games = [GameResult.of([0], [1])] * 5 + two_player(0, 1, 3) + two_player(1, 0, 3)
    r = compute_ratings(2, games, 0)
    assert r.stats.converged
    assert abs(r.ratings[0].rating - r.ratings[1].rating) < 50


def test_expand_weights_sum_per_game():
    """Total comparison weight per game = number of distinct beat-levels
    with ties sharing fractionally."""
    comps = expand_games_to_comparisons([GameResult.of([0, 1, 2, 3], [1, 2, 2, 4])])
    # level 1 beats {1,2,3} (w=1); tied pair each beat {3} (w=0.5 x2)
    assert sum(c.weight for c in comps) == pytest.approx(2.0)


def test_anchor_elo_config():
    r = compute_ratings(
        2, two_player(0, 1, 5), 0, PlackettLuceConfig(anchor_elo=1500.0)
    )
    assert r.ratings[0].rating == pytest.approx(1500.0)


# ------------------------------------------------------- conversions
def test_gamma_elo_inverse():
    for g in (-2.0, 0.0, 1.7):
        assert elo_to_gamma(gamma_to_elo(g)) == pytest.approx(g)


def test_elo_scale_win_probability_guide():
    """+400 Elo -> ~91% expected win probability (print_rating_guide)."""
    gap = 400.0 / ELO_SCALE
    p = 1.0 / (1.0 + np.exp(-gap))
    assert p == pytest.approx(0.91, abs=0.01)


def test_warm_start_converges_to_same_ratings():
    """init_gammas warm-starts the MM at the unique (centered) PL MLE
    fixed point: ratings from a warm start must match a cold solve
    within the convergence threshold, in both the native engine and the
    pure-Python fallback."""
    import numpy as np

    from burn_ppo_tpu.selfplay.plackett_luce import (
        ELO_SCALE,
        GameResult,
        PlackettLuceConfig,
        comparisons_to_arrays,
        compute_ratings,
        compute_ratings_from_comparisons,
        expand_games_to_comparisons,
    )

    rng = np.random.default_rng(5)
    n = 8
    games = []
    for _ in range(300):
        players = list(map(int, rng.choice(n, size=3, replace=False)))
        games.append(GameResult.of(players, list(map(int, rng.permutation(3) + 1))))

    cold = compute_ratings(n, games, 0, PlackettLuceConfig())
    assert cold.stats.converged

    gp = np.zeros(n, np.int64)
    for g in games:
        for p in g.players:
            gp[p] += 1
    arrays = comparisons_to_arrays(expand_games_to_comparisons(games))
    init = (np.asarray([r.rating for r in cold.ratings]) - 1500.0) / ELO_SCALE
    warm = compute_ratings_from_comparisons(
        n, arrays, gp, 0, PlackettLuceConfig(), init_gammas=init
    )
    assert warm.stats.converged
    assert warm.stats.iterations_used < cold.stats.iterations_used
    for a, b in zip(cold.ratings, warm.ratings):
        assert abs(a.rating - b.rating) < 1e-2
        assert abs(a.uncertainty - b.uncertainty) < 1e-2


def test_warm_start_python_fallback_matches(monkeypatch):
    import numpy as np

    monkeypatch.setenv("BURN_PPO_NO_NATIVE", "1")
    test_warm_start_converges_to_same_ratings()
