"""Extended opponent-pool tests (reference opponent_pool.rs has 31:
selection properties, EMA bounds, scoring semantics, persistence,
graphs)."""

import json
import math

import numpy as np
import pytest

from burn_ppo_tpu.selfplay.opponent_pool import OpponentPool, OpponentStats


def make_pool(tmp_path, **kw):
    return OpponentPool(tmp_path, **kw)


def add(pool, n):
    for i in range(n):
        pool.add_checkpoint(f"step_{(i + 1) * 100:08d}", (i + 1) * 100)


# ------------------------------------------------------- registration
def test_scan_checkpoints_registers_dirs(tmp_path):
    for step in (100, 200):
        (tmp_path / "checkpoints" / f"step_{step:08d}").mkdir(parents=True)
    (tmp_path / "checkpoints" / "latest").mkdir()  # not a step dir
    (tmp_path / "checkpoints" / "step_junk").mkdir()
    pool = make_pool(tmp_path)
    assert len(pool) == 2
    assert "step_00000100" in pool.stats


def test_add_checkpoint_idempotent(tmp_path):
    pool = make_pool(tmp_path)
    pool.add_checkpoint("step_00000100", 100)
    pool.stats["step_00000100"].win_rate = 0.9
    pool.add_checkpoint("step_00000100", 100)  # must not reset stats
    assert pool.stats["step_00000100"].win_rate == 0.9


# ------------------------------------------------------- selection
def test_selection_weight_formula(tmp_path):
    pool = make_pool(tmp_path, select_exponent=2.0)
    add(pool, 2)
    names = list(pool.stats)
    pool.stats[names[0]].win_rate = 0.2  # hard opponent
    pool.stats[names[1]].win_rate = 0.8
    w = pool.selection_weights()
    assert w[names[0]] == pytest.approx(0.8**2)
    assert w[names[1]] == pytest.approx(0.2**2)


def test_selection_exponent_sharpens(tmp_path):
    p1 = make_pool(tmp_path / "a", select_exponent=1.0)
    p4 = make_pool(tmp_path / "b", select_exponent=4.0)
    for p in (p1, p4):
        add(p, 2)
        names = list(p.stats)
        p.stats[names[0]].win_rate = 0.2
        p.stats[names[1]].win_rate = 0.8
    r1 = p1.selection_weights()
    r4 = p4.selection_weights()
    n0, n1 = list(r1)
    assert r4[n0] / r4[n1] > r1[n0] / r1[n1]  # higher exponent = sharper


def test_selection_weights_extreme_win_rates(tmp_path):
    """win_rate 0/1 and huge exponents stay finite and positive
    (opponent_pool.rs:1089-1348 numerical stability tests)."""
    pool = make_pool(tmp_path, select_exponent=50.0)
    add(pool, 3)
    names = list(pool.stats)
    pool.stats[names[0]].win_rate = 0.0
    pool.stats[names[1]].win_rate = 1.0
    pool.stats[names[2]].win_rate = 0.5
    w = pool.selection_weights()
    for v in w.values():
        assert math.isfinite(v) and v >= 0.0
    assert w[names[1]] > 0.0  # floored, never exactly zero


def test_sample_active_caps_at_max_active(tmp_path):
    pool = make_pool(tmp_path, max_active=3)
    add(pool, 10)
    chosen = pool.sample_active()
    assert len(chosen) == 3
    assert len(set(chosen)) == 3  # without replacement


def test_sample_active_fewer_than_max(tmp_path):
    pool = make_pool(tmp_path, max_active=8)
    add(pool, 2)
    assert len(pool.sample_active()) == 2


def test_sample_biased_toward_hard_opponents(tmp_path):
    pool = make_pool(tmp_path, max_active=1, select_exponent=2.0, seed=7)
    add(pool, 2)
    names = list(pool.stats)
    pool.stats[names[0]].win_rate = 0.05  # learner rarely beats it
    pool.stats[names[1]].win_rate = 0.95
    counts = {n: 0 for n in names}
    for _ in range(300):
        counts[pool.sample_active()[0]] += 1
    assert counts[names[0]] > counts[names[1]] * 5


# ------------------------------------------------------- scoring/EMA
def test_queue_game_result_scores(tmp_path):
    pool = make_pool(tmp_path, select_alpha=1.0)
    add(pool, 3)
    names = list(pool.stats)
    # learner placed 2nd; opp0 placed 1st (beat learner), opp1 tied,
    # opp2 placed 3rd (lost)
    pool.queue_game_result(names, 2, [1, 2, 3])
    pool.apply_pending_updates()
    # Learner-perspective STRICT wins (opponent_pool.rs:603): lost to
    # opp0, tied opp1 (tie = loss), beat opp2.
    assert pool.stats[names[0]].win_rate == pytest.approx(0.0)
    assert pool.stats[names[1]].win_rate == pytest.approx(0.0)
    assert pool.stats[names[2]].win_rate == pytest.approx(1.0)


def test_ema_alpha_blend(tmp_path):
    pool = make_pool(tmp_path, select_alpha=0.1)
    add(pool, 1)
    name = next(iter(pool.stats))
    pool.queue_game_result([name], 2, [1])  # opponent won
    pool.apply_pending_updates()
    assert pool.stats[name].win_rate == pytest.approx(0.5 * 0.9 + 0.0 * 0.1)


def test_ema_batched_once_per_rotation(tmp_path):
    """Many queued games fold as ONE batch average, not N EMA steps
    (opponent_pool.rs:628-653)."""
    pool = make_pool(tmp_path, select_alpha=0.5)
    add(pool, 1)
    name = next(iter(pool.stats))
    for _ in range(10):
        pool.queue_game_result([name], 1, [2])  # learner always wins
    pool.apply_pending_updates()
    # one blend: 0.5*0.5 + 1.0*0.5 = 0.75 (not a per-game EMA chain)
    assert pool.stats[name].win_rate == pytest.approx(0.75)
    assert pool.stats[name].games_played == 10


def test_win_rate_stays_in_unit_interval(tmp_path):
    pool = make_pool(tmp_path, select_alpha=1.0)
    add(pool, 1)
    name = next(iter(pool.stats))
    for result in ([1], [2]):
        pool.queue_game_result([name], result[0], [3 - result[0]])
        pool.apply_pending_updates()
        assert 0.0 <= pool.stats[name].win_rate <= 1.0


# ------------------------------------------------------- performance
def test_pool_performance_vs_best(tmp_path):
    pool = make_pool(tmp_path)
    add(pool, 2)
    names = list(pool.stats)
    pool.queue_game_result([names[0]], 1, [2])  # learner beats best
    pool.queue_game_result([names[1]], 2, [1])  # learner loses to other
    pool.apply_pending_updates()
    assert pool.get_pool_performance(names[0]) == pytest.approx(1.0)
    assert pool.get_pool_performance(names[1]) == pytest.approx(0.0)
    # No identified best -> None (reference opponent_pool.rs:921-934),
    # never an average over the whole pool.
    assert pool.get_pool_performance(None) is None
    # Best known but no recent games against it -> None too.
    assert pool.get_pool_performance("step_99999999") is None


def test_pool_performance_none_without_games(tmp_path):
    pool = make_pool(tmp_path)
    add(pool, 1)
    assert pool.get_pool_performance() is None


# ------------------------------------------------------- persistence
def test_stats_file_format(tmp_path):
    pool = make_pool(tmp_path)
    add(pool, 2)
    pool.save_stats()
    data = json.loads((tmp_path / "opponent_stats.json").read_text())
    assert len(data["opponents"]) == 2
    row = data["opponents"][0]
    assert set(row) == {"name", "step", "win_rate", "games_played"}


def test_stats_reload_roundtrip(tmp_path):
    pool = make_pool(tmp_path)
    add(pool, 1)
    name = next(iter(pool.stats))
    # Reload reconciles against disk; keep the entry's dir present.
    (tmp_path / "checkpoints" / name).mkdir(parents=True)
    pool.stats[name].win_rate = 0.77
    pool.stats[name].games_played = 42
    pool.save_stats()
    pool2 = make_pool(tmp_path)
    assert pool2.stats[name].win_rate == 0.77
    assert pool2.stats[name].games_played == 42


def test_selection_graph_written(tmp_path):
    pool = make_pool(tmp_path)
    add(pool, 3)
    out = tmp_path / "selection_probability.png"
    assert pool.generate_selection_graph(out)
    assert out.exists() and out.stat().st_size > 1000


def test_selection_graph_empty_pool(tmp_path):
    pool = make_pool(tmp_path)
    assert not pool.generate_selection_graph(tmp_path / "x.png")
