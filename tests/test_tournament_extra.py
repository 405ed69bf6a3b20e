"""Extended tournament tests (reference tournament.rs has ~100 in-module
tests: Swiss points, Dutch pairing, brackets, floaters, byes, repeats,
display names, discovery, match-level scoring)."""

from pathlib import Path

import pytest

from burn_ppo_tpu.tournament import (
    Contestant,
    calculate_swiss_points,
    compute_display_names,
    find_anchor_index,
    form_dutch_pods_with_floaters,
    round_robin_pods,
    select_evenly_spaced,
    swiss_pods,
    update_stats_from_games,
)
from burn_ppo_tpu.eval import PlayerSource


def C(name="c", seed=0.0, points=0.0, step=0, path=None):
    c = Contestant(
        name=name,
        source=PlayerSource.random(),
        path=path,
        step=step,
        initial_seed=seed,
    )
    c.swiss_points = points
    return c


# ------------------------------------------------------- swiss points
def test_swiss_points_empty():
    assert calculate_swiss_points([]) == []


def test_swiss_points_strict():
    assert calculate_swiss_points([1, 2, 3, 4]) == [3.0, 2.0, 1.0, 0.0]


def test_swiss_points_1224():
    assert calculate_swiss_points([1, 2, 2, 4]) == [3.0, 1.5, 1.5, 0.0]


def test_swiss_points_all_tied():
    pts = calculate_swiss_points([1, 1, 1])
    assert pts == [1.0, 1.0, 1.0]


def test_swiss_points_sum_invariant():
    """Total points = n(n-1)/2 regardless of ties."""
    for placements in ([1, 2, 3], [1, 1, 3], [1, 1, 1], [1, 2, 2]):
        assert sum(calculate_swiss_points(placements)) == pytest.approx(
            len(placements) * (len(placements) - 1) / 2
        )


# ------------------------------------------------------- dutch pairing
def test_dutch_pods_tiered_assignment():
    cs = [C(name=str(i)) for i in range(8)]
    pods, floaters = form_dutch_pods_with_floaters(list(range(8)), 4, cs)
    # pod 0: ranked[0], ranked[2], ranked[4], ranked[6] (tier stride 2)
    assert pods == [[0, 2, 4, 6], [1, 3, 5, 7]]
    assert floaters == []


def test_dutch_pods_floaters_left_over():
    cs = [C(name=str(i)) for i in range(7)]
    pods, floaters = form_dutch_pods_with_floaters(list(range(7)), 4, cs)
    assert len(pods) == 1
    assert len(floaters) == 3
    assert set(pods[0]) | set(floaters) == set(range(7))


def test_dutch_pods_too_few():
    cs = [C(name=str(i)) for i in range(3)]
    pods, floaters = form_dutch_pods_with_floaters([0, 1, 2], 4, cs)
    assert pods == [] and floaters == [0, 1, 2]


def test_dutch_repeat_avoidance_swap():
    cs = [C(name=str(i)) for i in range(8)]
    # 0 already faced 6 (its would-be last-tier partner)
    cs[0].opponents_faced = {6}
    cs[6].opponents_faced = {0}
    pods, _ = form_dutch_pods_with_floaters(list(range(8)), 4, cs)
    assert 6 not in pods[0]
    assert 7 in pods[0]  # swapped in from the other pod's last tier


def test_swiss_round1_seeds_by_initial_seed():
    cs = [C(name=str(i), seed=float(i)) for i in range(8)]
    pods = swiss_pods(cs, 4)
    # ranked desc by seed: 7,6,5,4,3,2,1,0 -> pod0 = [7,5,3,1]
    assert pods[0] == [7, 5, 3, 1]
    assert pods[1] == [6, 4, 2, 0]


def test_swiss_brackets_by_points():
    cs = [C(name=str(i), seed=float(i)) for i in range(8)]
    for i in (0, 1, 2, 3):
        cs[i].swiss_points = 3.0  # top bracket
    pods = swiss_pods(cs, 4)
    assert set(pods[0]) == {0, 1, 2, 3}
    assert set(pods[1]) == {4, 5, 6, 7}


def test_swiss_bracket_floaters_merge_down():
    cs = [C(name=str(i), seed=float(i)) for i in range(6)]
    cs[0].swiss_points = 3.0
    cs[1].swiss_points = 3.0  # two in top bracket -> float down
    pods = swiss_pods(cs, 4)
    assert len(pods) == 1
    assert 0 in pods[0] and 1 in pods[0]


def test_round_robin_pods_all_combinations():
    pods = round_robin_pods(5, 2)
    assert len(pods) == 10
    assert [0, 1] in pods and [3, 4] in pods


def test_round_robin_pod_size_4():
    assert len(round_robin_pods(6, 4)) == 15


# ------------------------------------------------------- match scoring
def test_match_level_scoring_strict_winner():
    cs = [C(name=str(i)) for i in range(4)]
    games = [[1, 2, 3, 4], [1, 2, 4, 3], [1, 3, 2, 4]]
    update_stats_from_games(cs, [0, 1, 2, 3], games)
    # contestant 0 won every game -> match winner -> 3 match points
    assert cs[0].swiss_points == 3.0
    assert cs[0].games_played == 3
    assert cs[0].placement_counts[0] == 3


def test_match_level_tie_shares():
    cs = [C(name=str(i)) for i in range(2)]
    update_stats_from_games(cs, [0, 1], [[1, 2], [2, 1]])
    assert cs[0].swiss_points == pytest.approx(0.5)
    assert cs[1].swiss_points == pytest.approx(0.5)


def test_match_draw_counting():
    cs = [C(name=str(i)) for i in range(2)]
    update_stats_from_games(cs, [0, 1], [[1, 1], [1, 2]])
    assert cs[0].draw_count == 1 and cs[1].draw_count == 1


def test_opponents_faced_updated():
    cs = [C(name=str(i)) for i in range(4)]
    update_stats_from_games(cs, [0, 2, 3, 1], [[1, 2, 3, 4]])
    assert cs[0].opponents_faced == {1, 2, 3}
    assert cs[2].opponents_faced == {0, 1, 3}


def test_no_games_is_noop():
    cs = [C(name="a"), C(name="b")]
    update_stats_from_games(cs, [0, 1], [])
    assert cs[0].swiss_points == 0.0 and cs[0].games_played == 0


# ------------------------------------------------------- display names
def test_display_names_single_path():
    assert compute_display_names([Path("runs/a/checkpoints/step_1")]) == ["step_1"]


def test_display_names_strip_common_prefix():
    names = compute_display_names(
        [
            Path("runs/skull_001/checkpoints/step_00000100"),
            Path("runs/skull_001/checkpoints/step_00000200"),
        ]
    )
    assert names == ["step_00000100", "step_00000200"]


def test_display_names_collapse_common_middle():
    names = compute_display_names(
        [
            Path("runs/a/checkpoints/step_00000100"),
            Path("runs/b/checkpoints/step_00000100"),
        ]
    )
    assert names == ["a/...", "b/..."] or names == [
        "a/.../step_00000100",
        "b/.../step_00000100",
    ]
    assert names[0] != names[1]


def test_display_names_unique_for_distinct_paths():
    paths = [
        Path("runs/x/checkpoints/step_00000100"),
        Path("runs/y/checkpoints/step_00000100"),
        Path("runs/y/checkpoints/step_00000300"),
    ]
    names = compute_display_names(paths)
    assert len(set(names)) == 3


# ------------------------------------------------------- selection
def test_select_evenly_spaced_interior():
    # Picks INTERIOR positions k/(n+1): best/latest already claim the
    # endpoints in select_checkpoints_with_priority (tournament.rs:297).
    items = list(range(10))
    sel = select_evenly_spaced(items, 3)
    assert sel == [2, 5, 7]
    assert sel == sorted(sel)


def test_select_evenly_spaced_all_when_n_exceeds():
    assert select_evenly_spaced([1, 2], 5) == [1, 2]


def test_select_evenly_spaced_zero():
    assert select_evenly_spaced([1, 2, 3], 0) == []


# ------------------------------------------------------- anchor
def test_anchor_random_preferred():
    cs = [C(name="a", step=5, path=Path("x")), C(name="Random")]
    assert find_anchor_index(cs) == 1


def test_anchor_earliest_step_otherwise():
    cs = [
        C(name="a", step=500, path=Path("x")),
        C(name="b", step=100, path=Path("y")),
        C(name="c", step=300, path=Path("z")),
    ]
    assert find_anchor_index(cs) == 1


def test_anchor_fallback_last():
    cs = [C(name="a"), C(name="b")]
    assert find_anchor_index(cs) == 1


def test_points_graph_written(tmp_path):
    from burn_ppo_tpu.tournament import _generate_points_graph

    cs = [C(name=f"c{i}") for i in range(3)]
    history = [[0.0, 0.0, 0.0], [2.0, 1.0, 0.0], [3.5, 2.0, 0.5]]
    out = tmp_path / "t_points.png"
    assert _generate_points_graph(cs, history, out)
    assert out.exists() and out.stat().st_size > 1000


def test_points_graph_requires_rounds(tmp_path):
    from burn_ppo_tpu.tournament import _generate_points_graph

    assert not _generate_points_graph([], [[0.0]], tmp_path / "x.png")
