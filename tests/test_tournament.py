"""Tournament tests (reference tournament.rs tests: Swiss points, pairing,
byes, display names, discovery)."""

from pathlib import Path

import numpy as np
import pytest

from burn_ppo_tpu.config import Config
from burn_ppo_tpu.schedule import Schedule
from burn_ppo_tpu.tournament import (
    Contestant,
    calculate_swiss_points,
    compute_display_names,
    discover_contestants,
    find_anchor_index,
    form_dutch_pods_with_floaters,
    round_robin_pods,
    run_tournament,
    select_evenly_spaced,
    swiss_pods,
    update_stats_from_games,
)
from burn_ppo_tpu.train import Trainer


def C(name, seed=0.0, points=0.0, step=0):
    from burn_ppo_tpu.eval import PlayerSource

    c = Contestant(name=name, source=PlayerSource.random(), step=step,
                   initial_seed=seed)
    c.swiss_points = points
    return c


def test_swiss_points_two_player():
    assert calculate_swiss_points([1, 2]) == [1.0, 0.0]
    assert calculate_swiss_points([2, 1]) == [0.0, 1.0]
    assert calculate_swiss_points([1, 1]) == [0.5, 0.5]


def test_swiss_points_four_player():
    assert calculate_swiss_points([1, 2, 3, 4]) == [3.0, 2.0, 1.0, 0.0]
    # tie for first: positions 1,2 averaged -> 1.5 -> points 2.5
    pts = calculate_swiss_points([1, 1, 3, 4])
    assert pts[0] == pytest.approx(2.5)
    assert pts[1] == pytest.approx(2.5)
    assert pts[2] == pytest.approx(1.0)
    assert pts[3] == pytest.approx(0.0)


def test_dutch_pods_round1():
    # 8 contestants, 2-player pods: tiers [0-3] vs [4-7] -> pods (0,4),(1,5)...
    contestants = [C(f"c{i}", seed=8 - i) for i in range(8)]
    pods = swiss_pods(contestants, 2)
    assert len(pods) == 4
    assert pods[0] == [0, 4]
    assert pods[1] == [1, 5]


def test_swiss_brackets_after_round1():
    contestants = [C(f"c{i}", seed=8 - i) for i in range(8)]
    for i in (0, 1, 2, 3):
        contestants[i].swiss_points = 1.0
    pods = swiss_pods(contestants, 2)
    # winners play winners, losers play losers
    assert sorted(pods[0] + pods[1]) == [0, 1, 2, 3]
    assert sorted(pods[2] + pods[3]) == [4, 5, 6, 7]


def test_repeat_opponent_avoidance():
    contestants = [C(f"c{i}", seed=4 - i) for i in range(4)]
    contestants[0].opponents_faced = {2}
    contestants[2].opponents_faced = {0}
    pods, floaters = form_dutch_pods_with_floaters([0, 1, 2, 3], 2, contestants)
    assert not floaters
    for pod in pods:
        assert set(pod) != {0, 2}


def test_floaters_carry_down():
    contestants = [C(f"c{i}") for i in range(5)]
    contestants[0].swiss_points = 2.0
    contestants[1].swiss_points = 2.0
    contestants[2].swiss_points = 2.0
    pods = swiss_pods(contestants, 2)
    covered = sorted(x for pod in pods for x in pod)
    assert len(pods) == 2
    assert len(covered) == 4  # one floater unpodded


def test_round_robin_pods():
    pods = round_robin_pods(4, 2)
    assert len(pods) == 6
    pods4 = round_robin_pods(5, 4)
    assert len(pods4) == 5


def test_match_level_swiss_points():
    contestants = [C("a"), C("b")]
    # a wins 2 of 3 games -> match win -> +1.0 swiss point
    update_stats_from_games(contestants, [0, 1], [[1, 2], [1, 2], [2, 1]])
    assert contestants[0].swiss_points == pytest.approx(1.0)
    assert contestants[1].swiss_points == pytest.approx(0.0)
    assert contestants[0].games_played == 3
    assert contestants[0].placement_counts == [2, 1]
    assert 1 in contestants[0].opponents_faced


def test_match_tie_shares_points():
    contestants = [C("a"), C("b")]
    update_stats_from_games(contestants, [0, 1], [[1, 2], [2, 1]])
    assert contestants[0].swiss_points == pytest.approx(0.5)
    assert contestants[1].swiss_points == pytest.approx(0.5)


def test_select_evenly_spaced():
    cps = [Path(f"step_{i}") for i in range(10)]
    sel = select_evenly_spaced(cps, 1)
    assert sel == [cps[5]]
    sel3 = select_evenly_spaced(cps, 3)
    assert sel3 == [cps[2], cps[5], cps[7]]
    assert select_evenly_spaced(cps, 20) == cps


def test_display_names_compression():
    paths = [
        Path("/runs/exp_a/checkpoints/step_00000100"),
        Path("/runs/exp_a/checkpoints/step_00000200"),
        Path("/runs/exp_b/checkpoints/step_00000100"),
    ]
    names = compute_display_names(paths)
    assert len(set(names)) == 3
    assert "step_00000100" in names[0]
    # common middle "checkpoints" collapsed
    assert "checkpoints" not in names[0]


def test_anchor_prefers_random():
    contestants = [C("a", step=5), C("Random"), C("b", step=1)]
    assert find_anchor_index(contestants) == 1
    contestants2 = [C("a", step=5), C("b", step=1)]
    contestants2[0].path = Path("x")
    contestants2[1].path = Path("y")
    assert find_anchor_index(contestants2) == 1


@pytest.fixture(scope="module")
def two_runs(tmp_path_factory):
    base = tmp_path_factory.mktemp("runs")
    for i, seed in enumerate((31, 32)):
        cfg = Config(
            env="connect_four", num_envs=4, num_steps=16, total_steps=256,
            hidden_size=16, num_hidden=1, checkpoint_freq=128, log_freq=64,
            seed=seed, opponent_pool_fraction=0.0,
            learning_rate=Schedule.constant(1e-3),
        )
        Trainer(cfg, base / f"run{i}", quiet=True).train()
    return base


def test_discovery_from_run_dirs(two_runs):
    contestants = discover_contestants(
        [two_runs / "run0", two_runs / "run1"], limit_per_run=2
    )
    assert len(contestants) >= 2
    assert all(c.path is not None for c in contestants)
    names = [c.name for c in contestants]
    assert len(set(names)) == len(names)


def test_full_tournament_round_robin(two_runs, tmp_path):
    out = tmp_path / "results.json"
    results = run_tournament(
        [two_runs / "run0", two_runs / "run1"],
        num_games=6,
        num_envs=4,
        limit_per_run=1,
        include_random=True,
        seed=0,
        output=out,
        quiet=True,
    )
    assert results["format"] == "round_robin"
    assert results["total_games"] >= 6 * 3  # 3 matchups
    assert len(results["standings"]) == 3
    assert out.exists()
    # Random is the anchor at 1000
    random_row = next(r for r in results["standings"] if r["name"] == "Random")
    assert random_row["rating"] == pytest.approx(1000.0, abs=1.0)


def test_repeat_avoidance_with_bye_subset():
    """swiss_pods must pair in the GLOBAL index space when given a
    bye-reduced subset: opponents_faced stores global indices, so
    subset-local pairing would compare apples to oranges (the reference
    has exactly this bug, tournament.rs:756 vs :2123-2136)."""
    contestants = [C(f"c{i}", seed=10 - i) for i in range(5)]
    for c in contestants:
        c.swiss_points = 1.0  # past round 1, one bracket
    # Global pair (1, 3) already met (Dutch pairing would pod them);
    # contestant 0 got the bye this round.
    contestants[1].opponents_faced = {3}
    contestants[3].opponents_faced = {1}
    active = [1, 2, 3, 4]
    pods = swiss_pods(contestants, 2, indices=active)
    assert all(i in active for pod in pods for i in pod)
    for pod in pods:
        assert set(pod) != {1, 3}, "repeat pairing not avoided"


def test_select_checkpoints_priority_relative_paths(tmp_path, monkeypatch):
    """best==latest must occupy ONE slot even when the caller passes
    relative checkpoint paths (the best symlink resolves absolute)."""
    import json as _json

    from burn_ppo_tpu.tournament import (
        enumerate_checkpoints,
        select_checkpoints_with_priority,
    )

    ckpt = tmp_path / "run" / "checkpoints"
    for step in (100, 200, 300):
        d = ckpt / f"step_{step:08d}"
        d.mkdir(parents=True)
        (d / "metadata.json").write_text(
            _json.dumps({"step": step, "num_players": 2})
        )
    (ckpt / "best").symlink_to("step_00000300")
    monkeypatch.chdir(tmp_path)
    rel = enumerate_checkpoints(Path("run") / "checkpoints")
    picked = select_checkpoints_with_priority(
        Path("run") / "checkpoints", rel, limit=2
    )
    assert len(picked) == 2
    assert len({p.resolve() for p in picked}) == 2, (
        "best==latest consumed both slots"
    )


def test_tournament_rejects_mixed_environments(tmp_path):
    """A field mixing env_names must be rejected up front, not die
    mid-tournament on an XLA shape mismatch."""
    import jax

    from burn_ppo_tpu.checkpoint import CheckpointManager, build_metadata
    from burn_ppo_tpu.models.network import ActorCriticNetwork

    for name, env in (("a", "connect_four"), ("b", "skull")):
        net = ActorCriticNetwork(
            network_type="mlp", obs_dim=5, action_count=2,
            hidden_size=8, num_hidden=1, activation="tanh",
        )
        params = net.init(jax.random.PRNGKey(0))
        mgr = CheckpointManager(tmp_path / name)
        meta = build_metadata(
            step=100, env_name=env, network=net, num_players=2
        )
        mgr.save(100, params, {}, {}, meta)
    with pytest.raises(ValueError, match="mixed environments"):
        run_tournament([tmp_path / "a", tmp_path / "b"], quiet=True)
