"""Native (C++) Plackett-Luce engine: availability + exact parity with
the pure-Python implementation across game shapes, ties, and edge cases."""

import numpy as np
import pytest

from burn_ppo_tpu.selfplay.plackett_luce import (
    GameResult,
    PlackettLuceConfig,
    compute_ratings,
    expand_games_to_comparisons,
)
from burn_ppo_tpu.native import plackett_luce as native


def _python_ratings(num_players, games, anchor, config=PlackettLuceConfig()):
    """Force the pure-Python path regardless of native availability."""
    import burn_ppo_tpu.native.plackett_luce as mod

    old_lib, old_checked = mod._lib, mod._lib_checked
    mod._lib, mod._lib_checked = None, True
    try:
        return compute_ratings(num_players, games, anchor, config)
    finally:
        mod._lib, mod._lib_checked = old_lib, old_checked


def _native_ratings(num_players, games, anchor, config=PlackettLuceConfig()):
    if not native.available():
        pytest.skip("native plackett_luce unavailable (no compiler)")
    return compute_ratings(num_players, games, anchor, config)


def _assert_parity(num_players, games, anchor=0):
    py = _python_ratings(num_players, games, anchor)
    nat = _native_ratings(num_players, games, anchor)
    assert nat.stats.converged == py.stats.converged
    assert nat.stats.iterations_used == py.stats.iterations_used
    assert abs(nat.stats.final_delta - py.stats.final_delta) < 1e-9
    for a, b in zip(nat.ratings, py.ratings):
        assert abs(a.rating - b.rating) < 1e-6, (a.rating, b.rating)
        assert abs(a.uncertainty - b.uncertainty) < 1e-6


def test_native_available():
    assert native.available(), "g++ is in the image; native build must work"


def test_parity_two_player_games():
    games = [
        GameResult.of([0, 1], [1, 2]),
        GameResult.of([0, 1], [1, 2]),
        GameResult.of([1, 0], [1, 2]),
        GameResult.of([0, 2], [2, 1]),
    ]
    _assert_parity(3, games)


def test_parity_multiplayer_with_ties():
    games = [
        GameResult.of([0, 1, 2, 3], [1, 2, 2, 4]),
        GameResult.of([3, 2, 1, 0], [1, 1, 3, 3]),
        GameResult.of([0, 1, 2, 3], [4, 3, 2, 1]),
        GameResult.of([1, 2, 3, 0], [2, 1, 4, 3]),
    ]
    _assert_parity(4, games)


def test_parity_random_games():
    rng = np.random.default_rng(42)
    n = 12
    games = []
    for _ in range(200):
        k = int(rng.integers(2, 5))
        players = rng.choice(n, size=k, replace=False).tolist()
        placements = rng.permutation(k) + 1
        if rng.random() < 0.3:  # inject ties
            placements[placements == placements.max()] = 1
        games.append(GameResult.of(players, placements.tolist()))
    _assert_parity(n, games, anchor=3)


def test_parity_never_wins_player():
    games = [GameResult.of([0, 1], [1, 2]) for _ in range(5)]
    _assert_parity(2, games)  # player 1 never wins -> gamma -1 walk


def test_parity_unplayed_players():
    games = [GameResult.of([0, 1], [1, 2])]
    py = _python_ratings(4, games, 0)
    nat = _native_ratings(4, games, 0)
    for i in (2, 3):
        assert nat.ratings[i].rating == py.ratings[i].rating == 1000.0
        assert nat.ratings[i].uncertainty == py.ratings[i].uncertainty == 350.0


def test_parity_anchor_pinning():
    games = [
        GameResult.of([0, 1], [1, 2]),
        GameResult.of([1, 2], [1, 2]),
        GameResult.of([2, 0], [1, 2]),
        GameResult.of([0, 1], [1, 2]),
    ]
    for anchor in range(3):
        py = _python_ratings(3, games, anchor)
        nat = _native_ratings(3, games, anchor)
        assert abs(nat.ratings[anchor].rating - 1000.0) < 1e-6
        assert abs(py.ratings[anchor].rating - 1000.0) < 1e-6
        assert nat.ratings[anchor].uncertainty == 0.0
        for a, b in zip(nat.ratings, py.ratings):
            assert abs(a.rating - b.rating) < 1e-6


def test_parity_large_tournament_and_speed():
    """500 players, 5000 games — the native path must agree and be fast."""
    import time

    if not native.available():
        pytest.skip("native unavailable")
    rng = np.random.default_rng(7)
    n = 500
    games = []
    for _ in range(5000):
        players = rng.choice(n, size=4, replace=False).tolist()
        placements = (rng.permutation(4) + 1).tolist()
        games.append(GameResult.of(players, placements))
    t0 = time.perf_counter()
    nat = compute_ratings(n, games, 0)
    native_ms = (time.perf_counter() - t0) * 1000
    assert nat.stats.iterations_used > 0
    # Spot-check parity on a subsample (full python run is slow).
    sub = games[:400]
    py = _python_ratings(50, [g for g in sub if max(g.players) < 50], 0)
    nat2 = _native_ratings(50, [g for g in sub if max(g.players) < 50], 0)
    for a, b in zip(nat2.ratings, py.ratings):
        assert abs(a.rating - b.rating) < 1e-6
    assert native_ms < 30_000


def test_comparisons_expansion_unchanged():
    """The Python expansion feeds the native engine; pin its shape."""
    comps = expand_games_to_comparisons(
        [GameResult.of([5, 7, 9], [1, 1, 3])]
    )
    # tied winners each beat the last player at half weight; the tied
    # pair produce no comparison against each other
    assert len(comps) == 2
    assert {c.winner for c in comps} == {5, 7}
    assert all(c.losers == [9] for c in comps)
    assert all(c.weight == 0.5 for c in comps)
