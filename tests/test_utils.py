"""Host helper tests: Swiss points, placements, durations
(reference src/env.rs:208-261, src/eval.rs:276-306, src/utils.rs)."""

import pytest

from burn_ppo_tpu.utils import (
    compute_avg_points,
    format_duration,
    rewards_to_placements,
)


# --------------------------------------------------------- swiss points
def test_avg_points_two_player_win():
    avg, counts, draw = compute_avg_points([[1, 2]], 2)
    assert avg == [1.0, 0.0]
    assert counts == [1, 1]
    assert draw == 0.0


def test_avg_points_two_player_draw():
    avg, counts, draw = compute_avg_points([[1, 1]], 2)
    # both tied at position 1.5 -> points 0.5 each
    assert avg == [0.5, 0.5]
    assert draw == 1.0


def test_avg_points_four_player_strict():
    avg, _c, _d = compute_avg_points([[1, 2, 3, 4]], 4)
    assert avg == [3.0, 2.0, 1.0, 0.0]


def test_avg_points_1224_ranking():
    # placements 1,2,2,4: tied pair spans positions 2-3 -> avg 2.5
    avg, _c, _d = compute_avg_points([[1, 2, 2, 4]], 4)
    assert avg == [3.0, 1.5, 1.5, 0.0]


def test_avg_points_averages_over_games():
    avg, counts, draw = compute_avg_points([[1, 2], [2, 1]], 2)
    assert avg == [0.5, 0.5]
    assert counts == [2, 2]
    assert draw == 0.0


def test_avg_points_empty():
    avg, counts, draw = compute_avg_points([], 3)
    assert avg == [0.0, 0.0, 0.0]
    assert counts == [0, 0, 0]
    assert draw == 0.0


def test_avg_points_all_tied_is_draw():
    _avg, _c, draw = compute_avg_points([[1, 1, 1]], 3)
    assert draw == 1.0


def test_avg_points_partial_tie_not_draw():
    _avg, _c, draw = compute_avg_points([[1, 1, 3]], 3)
    assert draw == 0.0


def test_avg_points_max_players_truncates():
    avg, counts, _d = compute_avg_points([[1, 2, 3, 4]], 2)
    assert len(avg) == 2 and counts == [1, 1]


# --------------------------------------------------------- placements
def test_rewards_to_placements_strict():
    assert rewards_to_placements([1.0, -1.0]) == [1, 2]


def test_rewards_to_placements_multiplayer():
    assert rewards_to_placements([0.33, 1.0, -1.0, -0.33]) == [2, 1, 4, 3]


def test_rewards_to_placements_tie_1224():
    assert rewards_to_placements([1.0, 0.5, 0.5, 0.0]) == [1, 2, 2, 4]


def test_rewards_to_placements_all_equal():
    assert rewards_to_placements([0.0, 0.0, 0.0]) == [1, 1, 1]


def test_rewards_to_placements_empty():
    assert rewards_to_placements([]) == []


# --------------------------------------------------------- duration fmt
@pytest.mark.parametrize(
    "seconds,expect",
    [(5, "5s"), (65, "1m05s"), (3600, "1h00m00s"), (3725, "1h02m05s")],
)
def test_format_duration(seconds, expect):
    assert format_duration(seconds) == expect
