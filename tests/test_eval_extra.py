"""Extended eval-layer tests: temperature schedules, stats aggregation,
sampling, player sources (reference eval.rs has 38 in-module tests)."""

import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from burn_ppo_tpu.envs import make_env
from burn_ppo_tpu.eval import (
    EvalStats,
    PlayerSource,
    TempSchedule,
    generate_permutations,
    sample_with_temperature,
)


def args(**kw):
    base = dict(temp=None, temp_final=None, temp_cutoff=None,
                no_temp_cutoff=False, temp_decay=False)
    base.update(kw)
    return types.SimpleNamespace(**base)


# ------------------------------------------------------- temp schedule
def test_from_args_env_defaults_connect_four():
    env = make_env("connect_four")
    ts = TempSchedule.from_args(env, args())
    assert ts.initial == pytest.approx(0.4)
    assert ts.cutoff == 10
    assert ts.final_temp == 0.0


def test_from_args_env_defaults_skull_constant():
    env = make_env("skull")
    ts = TempSchedule.from_args(env, args())
    assert ts.initial == 1.0
    assert ts.cutoff is None


def test_from_args_overrides():
    env = make_env("connect_four")
    ts = TempSchedule.from_args(env, args(temp=0.8, temp_cutoff=5, temp_final=0.2))
    assert ts.initial == 0.8 and ts.cutoff == 5 and ts.final_temp == 0.2


def test_from_args_no_cutoff_flag():
    env = make_env("connect_four")
    ts = TempSchedule.from_args(env, args(no_temp_cutoff=True, temp=0.7))
    assert ts.cutoff is None and ts.initial == 0.7


def test_from_args_final_without_cutoff_rejected():
    env = make_env("cartpole")  # no env cutoff default
    with pytest.raises(ValueError, match="temp-final"):
        TempSchedule.from_args(env, args(temp_final=0.1))


def test_get_temp_cutoff_step():
    ts = TempSchedule(initial=0.9, final_temp=0.1, cutoff=10)
    assert float(ts.get_temp(0)) == pytest.approx(0.9)
    assert float(ts.get_temp(9)) == pytest.approx(0.9)
    assert float(ts.get_temp(10)) == pytest.approx(0.1)
    assert float(ts.get_temp(100)) == pytest.approx(0.1)


def test_get_temp_decay_linear():
    ts = TempSchedule(initial=1.0, final_temp=0.0, cutoff=10, decay=True)
    assert float(ts.get_temp(0)) == pytest.approx(1.0)
    assert float(ts.get_temp(5)) == pytest.approx(0.5)
    assert float(ts.get_temp(10)) == pytest.approx(0.0)


def test_get_temp_vectorized():
    ts = TempSchedule(initial=0.4, final_temp=0.0, cutoff=10)
    temps = np.asarray(ts.get_temp(jnp.asarray([0, 9, 10, 20])))
    np.testing.assert_allclose(temps, [0.4, 0.4, 0.0, 0.0])


def test_describe_strings():
    assert "constant" in TempSchedule(0.5).describe()
    assert "cutoff" in TempSchedule(0.5, 0.0, 10).describe()
    assert "decay" in TempSchedule(0.5, 0.0, 10, decay=True).describe()


# ------------------------------------------------------- sampling
def test_sample_temperature_zero_is_argmax():
    logits = jnp.asarray([[0.1, 2.0, 0.3], [3.0, 0.2, 0.1]])
    a = sample_with_temperature(
        jax.random.PRNGKey(0), logits, jnp.asarray([0.0, 0.0])
    )
    assert np.asarray(a).tolist() == [1, 0]


def test_sample_high_temperature_spreads():
    logits = jnp.tile(jnp.asarray([[0.0, 3.0]]), (2000, 1))
    a = np.asarray(
        sample_with_temperature(
            jax.random.PRNGKey(1), logits, jnp.full((2000,), 10.0)
        )
    )
    # at temp 10 the 3-logit gap shrinks to 0.3 -> both actions common
    assert 0.25 < a.mean() < 0.75


def test_sample_low_temperature_sharpens():
    logits = jnp.tile(jnp.asarray([[0.0, 1.0]]), (2000, 1))
    a = np.asarray(
        sample_with_temperature(
            jax.random.PRNGKey(2), logits, jnp.full((2000,), 0.1)
        )
    )
    assert a.mean() > 0.98


# ------------------------------------------------------- permutations
def test_permutations_counts():
    assert generate_permutations(2).shape == (2, 2)
    assert generate_permutations(4).shape == (24, 4)


def test_permutations_are_unique_and_complete():
    perms = generate_permutations(3)
    assert len({tuple(p) for p in perms}) == 6
    for p in perms:
        assert sorted(p) == [0, 1, 2]


# ------------------------------------------------------- stats
def test_eval_stats_win_rates():
    st = EvalStats(["A", "B"], num_players=2)
    st.record_game([0, 1], [1, 2], [1.0, -1.0])
    st.record_game([1, 0], [1, 2], [1.0, -1.0])
    st.record_game([0, 1], [1, 2], [1.0, -1.0])
    rows = st.summary_rows()
    assert rows[0]["win_rate"] == pytest.approx(2 / 3)
    assert rows[1]["win_rate"] == pytest.approx(1 / 3)
    assert rows[0]["avg_reward"] == pytest.approx((1 - 1 + 1) / 3)


def test_eval_stats_draws_counted():
    st = EvalStats(["A", "B"], num_players=2)
    st.record_game([0, 1], [1, 1], [0.0, 0.0])
    assert st.draws == 1
    assert st.total_games == 1


def test_eval_stats_seat_to_source_mapping():
    """Placements accrue to the SOURCE, independent of seat."""
    st = EvalStats(["A", "B"], num_players=2)
    st.record_game([1, 0], [2, 1], [-1.0, 1.0])  # seat0=B placed 2nd
    assert st.placements[0] == [1, 0]  # A won from seat 1
    assert st.placements[1] == [0, 1]


def test_eval_stats_multiplayer_avg_placement():
    st = EvalStats(["A", "B", "C", "D"], num_players=4)
    st.record_game([0, 1, 2, 3], [1, 2, 3, 4], [1.0, 0.33, -0.33, -1.0])
    st.record_game([0, 1, 2, 3], [4, 3, 2, 1], [-1.0, -0.33, 0.33, 1.0])
    rows = st.summary_rows()
    assert rows[0]["avg_placement"] == pytest.approx(2.5)
    assert rows[3]["avg_placement"] == pytest.approx(2.5)


def test_eval_stats_print_table_smoke(capsys):
    st = EvalStats(["A", "B"], num_players=2)
    st.record_game([0, 1], [1, 2], [1.0, -1.0])
    st.print_table()
    out = capsys.readouterr().out
    assert "A" in out and "Win%" in out


# ------------------------------------------------------- sources
def test_player_source_kinds():
    assert PlayerSource.random().kind == "random"
    assert PlayerSource.human("me").kind == "human"
    assert PlayerSource.human("me").name == "me"


# ------------------------------------------------------- watch mode
def test_watch_mode_random_players(capsys):
    from burn_ppo_tpu.eval import run_watch_mode

    env = make_env("connect_four")
    run_watch_mode(
        env, [PlayerSource.random(), PlayerSource.random()],
        num_games=1, temp=TempSchedule(1.0), seed=0,
    )
    out = capsys.readouterr().out
    assert "=== Game 1/1 ===" in out
    assert "Final rewards" in out
    assert "Random (P0)" in out


def test_watch_mode_step_mode_waits_for_enter(capsys, monkeypatch):
    from burn_ppo_tpu.eval import run_watch_mode

    presses = []
    monkeypatch.setattr("builtins.input", lambda *_: presses.append(1) or "")
    env = make_env("connect_four")
    run_watch_mode(
        env, [PlayerSource.random(), PlayerSource.random()],
        num_games=1, temp=TempSchedule(1.0), seed=1, step_mode=True,
    )
    assert len(presses) > 0  # paused at least once per move


def test_human_interactive_game(capsys, monkeypatch):
    """Full human-vs-random game through the terminal loop."""
    from burn_ppo_tpu.eval import run_interactive_evaluation

    env = make_env("connect_four")
    moves = iter(["1", "2", "3", "4", "5", "6", "7"] * 6)
    monkeypatch.setattr("builtins.input", lambda *_: next(moves))
    run_interactive_evaluation(
        env, [PlayerSource.human("You"), PlayerSource.random()],
        num_games=1, temp=TempSchedule(1.0), seed=2,
    )
    out = capsys.readouterr().out
    assert "Final rewards" in out or "wins" in out.lower()


# ------------------------------------------------------- ratings table
def test_eval_stats_ratings_dominant_source():
    st = EvalStats(["Model", "Random"], num_players=2)
    for _ in range(30):
        st.record_game([0, 1], [1, 2], [1.0, -1.0])
    for _ in range(5):
        st.record_game([0, 1], [2, 1], [-1.0, 1.0])
    result, n_rated = st.compute_ratings()
    assert n_rated == 35
    assert result.ratings[1].rating == 1000.0  # Random anchored
    assert result.ratings[0].rating > 1100.0


def test_eval_stats_print_includes_ratings(capsys):
    st = EvalStats(["A", "Random"], num_players=2)
    st.record_game([0, 1], [1, 2], [1.0, -1.0])
    st.record_game([1, 0], [2, 1], [-1.0, 1.0])
    st.print_table()
    out = capsys.readouterr().out
    assert "Rating" in out


def test_eval_stats_no_ratings_for_selfplay(capsys):
    st = EvalStats(["A"], num_players=2)
    st.record_game([0, 0], [1, 2], [1.0, -1.0])
    st.print_table()
    assert "Rating" not in capsys.readouterr().out


def test_eval_stats_ratings_skip_multiseat_games(capsys):
    """Games where one source holds multiple seats (S != P cycling) are
    excluded from the ratings fit; with only such games, no table prints."""
    st = EvalStats(["A", "Random"], num_players=4)
    st.record_game([0, 1, 0, 1], [1, 2, 3, 4], [1.0, 0.33, -0.33, -1.0])
    result, n_rated = st.compute_ratings()
    assert n_rated == 0
    st.print_table()
    assert "Rating" not in capsys.readouterr().out


def test_checkpoint_cache_invalidates_on_rewrite(tmp_path):
    import time as _time

    import jax
    from burn_ppo_tpu.checkpoint import CheckpointManager, build_metadata
    from burn_ppo_tpu.models.network import ActorCriticNetwork

    net = ActorCriticNetwork(network_type="mlp", obs_dim=5, action_count=2,
                             hidden_size=8, num_hidden=1, activation="tanh")
    mgr = CheckpointManager(tmp_path)
    meta = build_metadata(step=1, env_name="cartpole", network=net, num_players=1)
    p1 = net.init(jax.random.PRNGKey(0))
    path = mgr.save(1, p1, {}, {}, meta)
    PlayerSource._load_cache.clear()
    s1 = PlayerSource.checkpoint(path)
    _time.sleep(0.01)
    p2 = net.init(jax.random.PRNGKey(99))
    mgr.save(1, p2, {}, {}, meta)  # rewrite same step dir
    s2 = PlayerSource.checkpoint(path)
    a = np.asarray(s1.params["layers"][0]["kernel"])
    b = np.asarray(s2.params["layers"][0]["kernel"])
    assert not np.allclose(a, b)  # fresh weights served


def test_checkpoint_source_dedup_cache(tmp_path):
    """The same checkpoint path loads once across sources."""
    import jax
    from burn_ppo_tpu.checkpoint import CheckpointManager, build_metadata
    from burn_ppo_tpu.models.network import ActorCriticNetwork

    net = ActorCriticNetwork(network_type="mlp", obs_dim=5, action_count=2,
                             hidden_size=8, num_hidden=1, activation="tanh")
    params = net.init(jax.random.PRNGKey(0))
    mgr = CheckpointManager(tmp_path)
    meta = build_metadata(step=1, env_name="cartpole", network=net, num_players=1)
    path = mgr.save(1, params, {}, {}, meta)

    PlayerSource._load_cache.clear()
    s1 = PlayerSource.checkpoint(path)
    s2 = PlayerSource.checkpoint(path)
    assert s1.params is s2.params  # shared, not reloaded
    assert len(PlayerSource._load_cache) == 1


# ------------------------------------------- CLI seat assignment (humans)
def test_cli_human_never_truncated(monkeypatch):
    """When checkpoints + humans exceed the seat count, excess NON-human
    sources are dropped — the human always keeps a seat (a plain
    seats[:P] used to silently cut the human off the tail)."""
    import burn_ppo_tpu.eval as ev

    srcs = [ev.PlayerSource.random(), ev.PlayerSource.random(),
            ev.PlayerSource.human("Me")]
    monkeypatch.setattr(ev, "build_sources",
                        lambda a, e=None: (srcs, "connect_four"))
    captured = {}

    def fake_interactive(env, seats, num_games, temp, seed):
        captured["seats"] = seats

    monkeypatch.setattr(ev, "run_interactive_evaluation", fake_interactive)
    ns = args(env_name=None, players=None, num_games=1, seed=0,
              watch=False, step=False, animate=False, fps=2.0,
              num_envs=8, humans=["Me"], random=False)
    assert ev.run_evaluation_cli(ns) == 0
    seats = captured["seats"]
    assert len(seats) == 2
    assert any(s.kind == "human" for s in seats)
    # Order preserved: the surviving non-human keeps the first seat.
    assert seats[0].kind == "random" and seats[1].kind == "human"


def test_cli_too_many_humans_errors(monkeypatch, capsys):
    import burn_ppo_tpu.eval as ev

    srcs = [ev.PlayerSource.human("A"), ev.PlayerSource.human("B"),
            ev.PlayerSource.human("C")]
    monkeypatch.setattr(ev, "build_sources",
                        lambda a, e=None: (srcs, "connect_four"))
    ns = args(env_name=None, players=None, num_games=1, seed=0,
              watch=False, step=False, animate=False, fps=2.0,
              num_envs=8, humans=["A", "B", "C"], random=False)
    assert ev.run_evaluation_cli(ns) == 1
    assert "humans" in capsys.readouterr().out
