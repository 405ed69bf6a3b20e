"""Swiss tournament runner tests with a stubbed game engine: multi-round
flow, byes, repeat avoidance across rounds, standings and JSON output
(reference tournament.rs runner tests around 1960-2300)."""

import json
from pathlib import Path

import jax
import numpy as np
import pytest

import burn_ppo_tpu.tournament as tmod
from burn_ppo_tpu.checkpoint import CheckpointManager, build_metadata
from burn_ppo_tpu.eval import EvalStats
from burn_ppo_tpu.models.network import ActorCriticNetwork


@pytest.fixture(scope="module")
def many_runs(tmp_path_factory):
    """12 connect-four checkpoints across 3 runs (forces Swiss: C(12,2)=66>50)."""
    base = tmp_path_factory.mktemp("swiss")
    net = ActorCriticNetwork(network_type="mlp", obs_dim=86, action_count=7,
                             hidden_size=8, num_hidden=1, activation="tanh")
    params = net.init(jax.random.PRNGKey(0))
    run_dirs = []
    step = 0
    for r in range(3):
        run = base / f"c4_{r:03d}"
        mgr = CheckpointManager(run)
        for i in range(4):
            step += 100
            meta = build_metadata(
                step=step, env_name="connect_four", network=net,
                num_players=2, avg_return=float(step),
            )
            mgr.save(step, params, {}, {}, meta)
        run_dirs.append(run)
    return run_dirs


def stub_stats_engine(monkeypatch):
    """Replace run_stats_mode: the lower contestant index always wins."""

    def fake_run_stats_mode(env, sources, num_games, num_envs=0, temp=None,
                            seed=None, quiet=False, **kw):
        st = EvalStats([s.name for s in sources], env.spec.num_players)
        for g in range(num_games):
            # seat order rotates; source 0 (as passed) always wins
            st.record_game([0, 1], [1, 2], [1.0, -1.0])
        return st

    monkeypatch.setattr(tmod, "run_stats_mode", fake_run_stats_mode)


def test_swiss_format_selected_and_rounds_run(many_runs, monkeypatch, capsys):
    stub_stats_engine(monkeypatch)
    results = tmod.run_tournament(
        [str(r) for r in many_runs], num_games=4, num_envs=2,
        seed=0, quiet=True,
    )
    assert results["format"] == "swiss"
    assert results["rounds"] >= 4  # ceil(log2(12)) + 1
    assert len(results["standings"]) == 12
    assert results["total_games"] > 0


def test_swiss_no_repeat_opponents_when_avoidable(many_runs, monkeypatch):
    stub_stats_engine(monkeypatch)
    results = tmod.run_tournament(
        [str(r) for r in many_runs], num_games=2, num_envs=2,
        rounds=3, seed=1, quiet=True,
    )
    # count repeated pairings across pods
    seen = set()
    repeats = 0
    for pod in results["pods"]:
        pair = tuple(sorted(pod["contestants"]))
        if pair in seen:
            repeats += 1
        seen.add(pair)
    # Dutch pairing with swap avoidance should keep repeats rare
    assert repeats <= len(results["pods"]) // 3


def test_swiss_standings_sorted_by_points(many_runs, monkeypatch):
    stub_stats_engine(monkeypatch)
    results = tmod.run_tournament(
        [str(r) for r in many_runs], num_games=2, num_envs=2,
        rounds=2, seed=2, quiet=True,
    )
    pts = [row["swiss_points"] for row in results["standings"]]
    assert pts == sorted(pts, reverse=True)
    assert results["standings"][0]["rank"] == 1


def test_byes_awarded_with_odd_field(many_runs, monkeypatch, capsys):
    stub_stats_engine(monkeypatch)
    # 12 checkpoints + Random = 13 contestants -> 1 bye per round
    results = tmod.run_tournament(
        [str(r) for r in many_runs], num_games=2, num_envs=2,
        rounds=2, include_random=True, seed=3, quiet=False,
    )
    out = capsys.readouterr().out
    assert "bye" in out.lower()
    assert len(results["standings"]) == 13
    # Bye recipients sit their round out (tournament.rs active_indices):
    # with 13 contestants every non-bye contestant is in exactly one pod
    # per round, and the bye name is in none.
    byes = {}  # round -> bye name
    for line in out.splitlines():
        if "receives bye" in line:
            byes[len(byes) + 1] = line.split(" receives bye")[0].strip()
    assert len(byes) == 2
    per_round = {}
    for pod in results["pods"]:
        per_round.setdefault(pod["round"], []).extend(pod["contestants"])
    for rnd, names in per_round.items():
        assert byes[rnd] not in names
        assert len(names) == 12 and len(set(names)) == 12


def test_json_output_written(many_runs, monkeypatch, tmp_path):
    stub_stats_engine(monkeypatch)
    out = tmp_path / "tournament.json"
    tmod.run_tournament(
        [str(r) for r in many_runs], num_games=2, num_envs=2,
        rounds=1, seed=4, output=out, quiet=True,
    )
    data = json.loads(out.read_text())
    assert data["env"] == "connect_four"
    assert {"rank", "name", "swiss_points", "rating", "games"} <= set(
        data["standings"][0]
    )


def test_graphs_written(many_runs, monkeypatch, tmp_path):
    stub_stats_engine(monkeypatch)
    out = tmp_path / "t.json"
    tmod.run_tournament(
        [str(r) for r in many_runs], num_games=2, num_envs=2,
        rounds=2, seed=5, output=out, graph=True, quiet=True,
    )
    assert (tmp_path / "t.png").exists()
    assert (tmp_path / "t_points.png").exists()


def test_limit_per_run(many_runs, monkeypatch):
    stub_stats_engine(monkeypatch)
    results = tmod.run_tournament(
        [str(r) for r in many_runs], num_games=2, num_envs=2,
        limit_per_run=2, rounds=1, seed=6, quiet=True,
    )
    assert len(results["standings"]) == 6  # 2 per run x 3 runs (round-robin now)


def test_too_few_contestants_rejected(many_runs, monkeypatch):
    stub_stats_engine(monkeypatch)
    with pytest.raises(ValueError, match="at least 2"):
        tmod.run_tournament(
            [str(many_runs[0])], limit_per_run=1, num_games=2, quiet=True
        )
