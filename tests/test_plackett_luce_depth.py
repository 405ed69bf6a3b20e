"""Plackett-Luce depth tests mirroring the reference's numerical-
stability/property suite (plackett_luce.rs:1187-2003): win-probability
calibration, circular preferences, sparse chains, tie scenarios,
order/scale robustness, and reduced-Hessian uncertainty behavior."""

import numpy as np
import pytest

from burn_ppo_tpu.selfplay.plackett_luce import (
    ELO_SCALE,
    GameResult,
    PlackettLuceConfig,
    compute_ratings,
    expand_games_to_comparisons,
)


def g(players, placements):
    return GameResult.of(players, placements)


def ratings(n, games, anchor=0, **cfg):
    return compute_ratings(n, games, anchor, PlackettLuceConfig(**cfg))


def head_to_head(wins_a: int, wins_b: int, ties: int = 0):
    games = []
    games += [g([0, 1], [1, 2])] * wins_a
    games += [g([0, 1], [2, 1])] * wins_b
    games += [g([0, 1], [1, 1])] * ties
    return games


# -------------------------------------------------------- win probability
@pytest.mark.parametrize(
    "wins,losses,lo,hi",
    [
        (60, 40, 50.0, 110.0),  # ~+70 Elo (plackett_luce.rs:1350)
        (75, 25, 150.0, 250.0),  # ~+191 Elo (rs:1378)
        (90, 10, 300.0, 480.0),  # ~+382 Elo (rs:1405)
    ],
)
def test_win_probability_calibration(wins, losses, lo, hi):
    r = ratings(2, head_to_head(wins, losses))
    gap = r.ratings[0].rating - r.ratings[1].rating
    assert lo < gap < hi, f"{wins}% win rate gave gap {gap}"


# ---------------------------------------------------------- structure
def test_circular_preferences_rock_paper_scissors():
    # 0 beats 1, 1 beats 2, 2 beats 0 equally often -> all equal.
    games = []
    for _ in range(30):
        games += [g([0, 1], [1, 2]), g([1, 2], [1, 2]), g([2, 0], [1, 2])]
    r = ratings(3, games)
    vals = [p.rating for p in r.ratings]
    assert max(vals) - min(vals) < 10.0


def test_sparse_comparison_graph_long_chain():
    # 0>1>2>3>4 with only adjacent matchups; ordering must propagate.
    games = []
    for i in range(4):
        games += [g([i, i + 1], [1, 2])] * 10
    r = ratings(5, games)
    vals = [p.rating for p in r.ratings]
    assert all(vals[i] > vals[i + 1] for i in range(4))


def test_rating_gaps_are_additive_in_chain():
    # A beats B 75%, B beats C 75% -> gap(A,C) ~ gap(A,B) + gap(B,C).
    games = []
    games += [g([0, 1], [1, 2])] * 75 + [g([0, 1], [2, 1])] * 25
    games += [g([1, 2], [1, 2])] * 75 + [g([1, 2], [2, 1])] * 25
    r = ratings(3, games, anchor=1)
    ab = r.ratings[0].rating - r.ratings[1].rating
    bc = r.ratings[1].rating - r.ratings[2].rating
    ac = r.ratings[0].rating - r.ratings[2].rating
    assert ac == pytest.approx(ab + bc, abs=1e-6)
    assert ab == pytest.approx(bc, rel=0.2)


def test_mixed_game_sizes():
    # 2p and 4p games mixed; player 0 dominates everywhere.
    games = []
    for _ in range(20):
        games.append(g([0, 1], [1, 2]))
        games.append(g([0, 1, 2, 3], [1, 2, 3, 4]))
    r = ratings(4, games)
    vals = [p.rating for p in r.ratings]
    assert vals[0] == max(vals)
    assert all(vals[i] >= vals[i + 1] - 1e-9 for i in range(3))


def test_all_players_equal_round_robin():
    games = []
    for a in range(4):
        for b in range(4):
            if a != b:
                games += [g([a, b], [1, 2])] * 5  # everyone beats everyone
    r = ratings(4, games)
    vals = [p.rating for p in r.ratings]
    assert max(vals) - min(vals) < 5.0


def test_four_player_game_ordering():
    games = [g([0, 1, 2, 3], [1, 2, 3, 4])] * 25
    r = ratings(4, games)
    vals = [p.rating for p in r.ratings]
    assert vals == sorted(vals, reverse=True)


# ------------------------------------------------------------- ties
def test_ties_three_way():
    games = [g([0, 1, 2], [1, 1, 1])] * 20
    r = ratings(3, games)
    vals = [p.rating for p in r.ratings]
    assert max(vals) - min(vals) < 5.0


def test_ties_partial():
    # 0 wins; 1 and 2 tie for second, 3 last -> r1 == r2, between 0 and 3.
    games = [g([0, 1, 2, 3], [1, 2, 2, 4])] * 30
    r = ratings(4, games)
    v = [p.rating for p in r.ratings]
    assert v[1] == pytest.approx(v[2], abs=1.0)
    assert v[0] > v[1] > v[3]


def test_ties_for_second_expansion_weights():
    comps = expand_games_to_comparisons([g([0, 1, 2, 3], [1, 2, 2, 4])])
    # winner over 3 lower, then each tied-second player gets weight 0.5
    # over the last-place player.
    tied = [c for c in comps if c.weight == 0.5]
    assert len(tied) == 2
    assert {c.winner for c in tied} == {1, 2}
    for c in tied:
        assert c.losers == [3]


def test_expansion_complex_tie_scenario():
    # [1, 1, 3, 3] (two tied pairs): each first-place player (w=0.5)
    # beats both third-place players; no comparisons among tied players.
    comps = expand_games_to_comparisons([g([0, 1, 2, 3], [1, 1, 3, 3])])
    assert all(c.weight == 0.5 for c in comps)
    assert sum(c.weight for c in comps) == pytest.approx(1.0)
    winners = {c.winner for c in comps}
    assert winners == {0, 1}
    for c in comps:
        assert sorted(c.losers) == [2, 3]


# -------------------------------------------------- numerical stability
def test_numerical_stability_no_nan_inf():
    # One player who always wins against many, extreme gamma spread.
    games = []
    for opp in range(1, 8):
        games += [g([0, opp], [1, 2])] * 50
    r = ratings(8, games)
    for p in r.ratings:
        assert np.isfinite(p.rating) and np.isfinite(p.uncertainty)
    assert r.ratings[0].rating > max(p.rating for p in r.ratings[1:])


def test_never_loses_extreme_exponent_finite():
    games = [g([0, 1], [1, 2])] * 1000
    r = ratings(2, games)
    gap = r.ratings[0].rating - r.ratings[1].rating
    assert np.isfinite(gap) and gap > 300.0


def test_determinism_same_input_same_output():
    games = head_to_head(13, 7, ties=3)
    r1 = ratings(2, games)
    r2 = ratings(2, games)
    for a, b in zip(r1.ratings, r2.ratings):
        assert a.rating == b.rating and a.uncertainty == b.uncertainty


def test_ratings_robust_to_game_order():
    games = head_to_head(20, 10, ties=5)
    rev = list(reversed(games))
    r1 = ratings(2, games)
    r2 = ratings(2, rev)
    assert r1.ratings[0].rating == pytest.approx(r2.ratings[0].rating, abs=1e-3)


def test_large_scale_many_players():
    rng = np.random.default_rng(0)
    N = 40
    games = []
    for _ in range(600):
        a, b = rng.choice(N, size=2, replace=False)
        # higher index = stronger
        win = rng.random() < 1.0 / (1.0 + np.exp((a - b) / 10.0))
        games.append(g([a, b], [2, 1] if win else [1, 2]))
    r = ratings(N, games)
    vals = [p.rating for p in r.ratings]
    assert all(np.isfinite(v) for v in vals)
    # Strong correlation with true skill ordering.
    corr = np.corrcoef(np.arange(N), vals)[0, 1]
    assert corr > 0.7


def test_unbalanced_game_counts():
    # Player 2 plays rarely but always wins -> rated above both.
    games = [g([0, 1], [1, 2])] * 100 + [g([2, 0], [1, 2])] * 4
    r = ratings(3, games)
    v = [p.rating for p in r.ratings]
    assert v[2] > v[0] > v[1]
    # Fewer games -> larger uncertainty than the heavily-played player 0.
    assert r.ratings[2].uncertainty > r.ratings[0].uncertainty


# ------------------------------------------------------- uncertainties
def test_uncertainty_sqrt_scaling():
    # 10x games -> ~sqrt(10)x lower sigma (plackett_luce.rs:1862).
    def mixed(n):
        games = []
        for i in range(n):
            games.append(
                g([0, 1], [[1, 2], [2, 1], [1, 1]][i % 3])
            )
        return games

    s10 = max(p.uncertainty for p in ratings(2, mixed(10), anchor=1).ratings)
    s100 = max(p.uncertainty for p in ratings(2, mixed(100), anchor=1).ratings)
    assert 2.0 < s10 / s100 < 5.0


def test_uncertainty_independent_of_inactive_player_count():
    games = [g([0, 1], [1, 2])] * 20
    r2 = ratings(2, games, anchor=1)
    r10 = ratings(10, games, anchor=1)
    assert abs(r2.ratings[0].uncertainty - r10.ratings[0].uncertainty) < 50.0


def test_reduced_hessian_gives_varied_uncertainties():
    games = [
        g([0, 1, 2], [(i % 3) + 1, ((i + 1) % 3) + 1, ((i + 2) % 3) + 1])
        for i in range(100)
    ]
    r = ratings(3, games, anchor=0)
    u = [p.uncertainty for p in r.ratings]
    assert max(u) - min(u) > 10.0
    assert r.ratings[0].uncertainty < 5.0  # anchor ~0


def test_stats_fields_valid():
    r = ratings(2, head_to_head(10, 5))
    s = r.stats
    assert s.converged
    assert s.iterations_used >= 1
    assert s.final_delta >= 0.0
    assert s.computation_time_ms >= 0.0


def test_non_convergence_reported():
    # A sparse 6-player chain needs many MM sweeps to propagate; 2
    # iterations at a 1e-12 threshold cannot converge. (A 2-player game
    # WOULD converge in 2 sweeps: its MM update is independent of the
    # current gammas.)
    games = []
    for i in range(5):
        games += [g([i, i + 1], [1, 2])] * 3 + [g([i, i + 1], [2, 1])]
    r = compute_ratings(
        6, games, 0,
        PlackettLuceConfig(max_iterations=2, convergence_threshold=1e-12),
    )
    assert not r.stats.converged
    assert r.stats.iterations_used == 2
    assert r.stats.final_delta > 0.0
    for p in r.ratings:
        assert np.isfinite(p.rating)


def test_two_player_mm_converges_in_two_sweeps():
    # Documented MM property: with 2 players every comparison involves
    # both, so the centered update is gamma-independent -> exact
    # convergence at sweep 2 even at a 1e-12 threshold.
    r = compute_ratings(
        2, head_to_head(500, 1), 0,
        PlackettLuceConfig(max_iterations=2, convergence_threshold=1e-12),
    )
    assert r.stats.converged
    assert r.stats.final_delta == 0.0


def test_elo_scale_400_difference():
    # The scale constant: 400/ln(10) Elo per unit gamma; a 400-Elo gap
    # corresponds to 10:1 odds (plackett_luce.rs:727).
    assert ELO_SCALE == pytest.approx(400.0 / np.log(10.0))
    p_win = 1.0 / (1.0 + 10 ** (-400.0 / 400.0))
    assert p_win == pytest.approx(10.0 / 11.0)


def test_five_player_ffa_consistent_rankings():
    rng = np.random.default_rng(1)
    games = []
    for _ in range(200):
        players = list(rng.permutation(5))
        order = sorted(players, reverse=True)  # higher idx = stronger
        placements = [order.index(p) + 1 for p in players]
        games.append(g(players, placements))
    r = ratings(5, games)
    vals = [p.rating for p in r.ratings]
    assert vals == sorted(vals)  # player 4 strongest
