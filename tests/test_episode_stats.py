"""On-device episode summaries + windowed tracker tests."""

import jax.numpy as jnp
import numpy as np

from burn_ppo_tpu.envs.base import EpisodeLog
from burn_ppo_tpu.ppo.episode_stats import (
    WindowedEpisodeTracker,
    summarize_episode_logs,
)
from burn_ppo_tpu.utils import compute_avg_points


def make_log(completed, totals, lengths, outcomes):
    completed = jnp.asarray(completed, bool)
    return EpisodeLog(
        completed=completed,
        total_rewards=jnp.asarray(totals, jnp.float32),
        length=jnp.asarray(lengths, jnp.int32),
        outcome=jnp.asarray(outcomes, jnp.int32),
        active_players=jnp.full(completed.shape, totals.shape[-1], jnp.int32),
    )


def test_summarize_single_player():
    # [T=2, E=2]; episodes finish at (0,0) and (1,1)
    totals = np.zeros((2, 2, 1), np.float32)
    totals[0, 0, 0] = 10.0
    totals[1, 1, 0] = 30.0
    log = make_log(
        [[True, False], [False, True]], totals,
        [[5, 0], [0, 15]], np.ones((2, 2, 1)),
    )
    s = summarize_episode_logs(log, 1)
    assert float(s["count"]) == 2.0
    assert float(s["ret_sum"][0]) == 40.0
    assert float(s["ret0_max"]) == 30.0
    assert float(s["ret0_min"]) == 10.0
    assert float(s["len_sum"]) == 20.0


def test_summarize_points_match_host_formula():
    placements = [[1, 2, 2, 4], [1, 1, 3, 3], [4, 3, 2, 1]]
    totals = np.zeros((1, 3, 4), np.float32)
    outc = np.asarray(placements).reshape(1, 3, 4)
    log = make_log([[True, True, True]], totals, [[1, 1, 1]], outc)
    s = summarize_episode_logs(log, 4)
    host_pts, _c, host_draws = compute_avg_points(placements, 4)
    np.testing.assert_allclose(
        np.asarray(s["pts_sum"]) / 3.0, host_pts, rtol=1e-6
    )
    assert float(s["draws"]) / 3.0 == host_draws


def test_summarize_draw_detection():
    outc = np.asarray([[[1, 1]], [[1, 2]]])  # draw then win
    totals = np.zeros((2, 1, 2), np.float32)
    log = make_log([[True], [True]], totals, [[3], [4]], outc)
    s = summarize_episode_logs(log, 2)
    assert float(s["draws"]) == 1.0


def test_summarize_ignores_incomplete_rows():
    totals = np.full((1, 2, 1), 99.0, np.float32)
    log = make_log([[False, False]], totals, [[7, 7]], np.ones((1, 2, 1)))
    s = summarize_episode_logs(log, 1)
    assert float(s["count"]) == 0.0
    assert float(s["ret_sum"][0]) == 0.0


def stats(count, ret0, pts=None, draws=0.0, P=2):
    ret_sum = np.zeros(P)
    ret_sum[0] = ret0 * count
    return {
        "count": float(count),
        "ret_sum": ret_sum,
        "ret0_max": float(ret0),
        "ret0_min": float(ret0),
        "len_sum": 10.0 * count,
        "pts_sum": np.asarray(pts if pts is not None else [0.5, 0.5]) * count,
        "draws": float(draws),
    }


def test_tracker_window_trims_at_update_granularity():
    tr = WindowedEpisodeTracker(2, window=100)
    tr.ingest(stats(60, 1.0))
    tr.ingest(stats(60, 2.0))
    tr.ingest(stats(60, 3.0))
    # Dropping the first update leaves 120 >= 100; dropping the second
    # would leave 60 < 100 so it stays.
    assert tr.window_count == 120.0
    assert tr.avg_return == (60 * 2.0 + 60 * 3.0) / 120.0
    assert tr.total_episodes == 180


def test_tracker_empty_updates_skipped():
    tr = WindowedEpisodeTracker(1)
    tr.ingest(stats(0, 0.0, P=1))
    assert not tr.has_data
    assert tr.avg_return == 0.0


def test_tracker_reports():
    tr = WindowedEpisodeTracker(2)
    tr.ingest(stats(10, 5.0, pts=[1.0, 0.0], draws=2))
    assert tr.avg_return == 5.0
    assert tr.return_max == 5.0
    assert tr.mean_length == 10.0
    np.testing.assert_allclose(tr.avg_points(), [1.0, 0.0])
    assert tr.draw_rate == 0.2


def test_tracker_resume_seed_display_only():
    """A resume seed feeds avg_return but not length/points series
    and never inflates total_episodes (supervisor restarts resume often)."""
    tr = WindowedEpisodeTracker(2)
    tr.seed(123.0, 21)
    assert tr.avg_return == 123.0
    assert not tr.has_data  # no real episode data yet
    assert tr.total_episodes == 0
    tr.ingest(stats(10, 5.0))
    assert tr.avg_return == 5.0  # real data replaces the seed
    assert tr.mean_length == 10.0


def test_summarize_excludes_no_outcome_games_from_points():
    """Zero placements are the no-outcome sentinel (invalid-action
    termination, connect_four.game_outcome): such games must contribute
    nothing to points or draws."""
    totals = np.zeros((1, 2, 2), np.float32)
    log = make_log(
        [[True, True]], totals,
        [[7, 7]],
        # env 0: real P0 win; env 1: no-outcome sentinel
        np.asarray([[[1, 2], [0, 0]]]),
    )
    s = summarize_episode_logs(log, 2)
    assert float(s["count"]) == 2.0
    # Only the real game contributes points: P0 gets 1, P1 gets 0.
    np.testing.assert_allclose(np.asarray(s["pts_sum"]), [1.0, 0.0])
    assert float(s["draws"]) == 0.0
