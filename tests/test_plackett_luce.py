"""Plackett-Luce rating tests (reference plackett_luce.rs:643+ tests)."""

import numpy as np
import pytest

from burn_ppo_tpu.selfplay.plackett_luce import (
    GameResult,
    PlackettLuceConfig,
    compute_ratings,
    expand_games_to_comparisons,
    gamma_to_elo,
    elo_to_gamma,
)


def G(players, placements):
    return GameResult.of(players, placements)


def test_elo_conversion_roundtrip():
    for elo in (800.0, 1000.0, 1523.4):
        assert gamma_to_elo(elo_to_gamma(elo)) == pytest.approx(elo)


def test_expand_simple_two_player():
    comps = expand_games_to_comparisons([G([0, 1], [1, 2])])
    assert len(comps) == 1
    assert comps[0].winner == 0
    assert comps[0].losers == [1]
    assert comps[0].weight == 1.0


def test_expand_tie_fractional_weights():
    comps = expand_games_to_comparisons([G([0, 1, 2], [1, 1, 3])])
    # Two tied winners each get a 1/2-weight win over player 2
    assert len(comps) == 2
    assert {c.winner for c in comps} == {0, 1}
    for c in comps:
        assert c.losers == [2]
        assert c.weight == pytest.approx(0.5)


def test_expand_multiplayer_chain():
    comps = expand_games_to_comparisons([G([0, 1, 2], [1, 2, 3])])
    # 0 beats {1,2}; 1 beats {2}
    assert len(comps) == 2
    assert comps[0].winner == 0 and sorted(comps[0].losers) == [1, 2]
    assert comps[1].winner == 1 and comps[1].losers == [2]


def test_dominant_player_rated_higher():
    games = [G([0, 1], [1, 2]) for _ in range(20)]
    res = compute_ratings(2, games, anchor_player_idx=1)
    assert res.stats.converged
    assert res.ratings[1].rating == pytest.approx(1000.0)
    assert res.ratings[0].rating > 1200.0
    assert res.ratings[1].uncertainty == 0.0  # anchor by definition


def test_balanced_players_equal_ratings():
    games = []
    for i in range(20):
        games.append(G([0, 1], [1, 2] if i % 2 == 0 else [2, 1]))
    res = compute_ratings(2, games, anchor_player_idx=1)
    assert abs(res.ratings[0].rating - res.ratings[1].rating) < 30.0


def test_win_probability_scale():
    # ~64% win rate should map to roughly +100 Elo
    games = []
    for i in range(1000):
        games.append(G([0, 1], [1, 2] if i % 100 < 64 else [2, 1]))
    res = compute_ratings(2, games, anchor_player_idx=1)
    diff = res.ratings[0].rating - res.ratings[1].rating
    assert 70 < diff < 130


def test_transitive_ordering():
    games = (
        [G([0, 1], [1, 2])] * 10 + [G([1, 2], [1, 2])] * 10 + [G([0, 2], [1, 2])] * 10
    )
    res = compute_ratings(3, games, anchor_player_idx=2)
    r = [pr.rating for pr in res.ratings]
    assert r[0] > r[1] > r[2]


def test_empty_and_no_games():
    res = compute_ratings(3, [], 0)
    assert all(r.rating == 1000.0 for r in res.ratings)
    res0 = compute_ratings(0, [], 0)
    assert res0.ratings == []


def test_player_without_games_gets_default():
    games = [G([0, 1], [1, 2])] * 5
    res = compute_ratings(3, games, anchor_player_idx=1)
    assert res.ratings[2].rating == 1000.0
    assert res.ratings[2].uncertainty == 350.0


def test_multiplayer_placements():
    # 4-player games where player 0 always 1st, 3 always last
    games = [G([0, 1, 2, 3], [1, 2, 3, 4])] * 15
    res = compute_ratings(4, games, anchor_player_idx=3)
    r = [pr.rating for pr in res.ratings]
    assert r[0] > r[1] > r[2] > r[3]
    assert r[3] == pytest.approx(1000.0)


def test_all_ties_stable():
    games = [G([0, 1], [1, 1])] * 10
    res = compute_ratings(2, games, anchor_player_idx=1)
    assert abs(res.ratings[0].rating - 1000.0) < 50.0


def test_winless_player_rated_below_anchor_games():
    games = [G([0, 1], [1, 2])] * 50
    res = compute_ratings(2, games, anchor_player_idx=0)
    # Anchor (always winner) at 1000, loser far below
    assert res.ratings[0].rating == pytest.approx(1000.0)
    assert res.ratings[1].rating < 900.0
