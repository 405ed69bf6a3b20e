"""Extended Connect Four rule tests: all win directions, edge wins,
invalid-move handling, outcome placements, random playout invariants
(reference connect_four.rs has 20 in-module tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from burn_ppo_tpu.envs import make_env
from burn_ppo_tpu.envs.connect_four import COLS, ROWS, _has_win


@pytest.fixture(scope="module")
def env():
    e = make_env("connect_four")
    e.step = jax.jit(e.step)
    e.action_mask = jax.jit(e.action_mask)
    return e


def fresh(env, seed=0):
    return env.reset(jax.random.PRNGKey(seed))


def play(env, s, cols):
    for c in cols:
        s = env.step(s, jnp.asarray(c, jnp.int32))
    return s


def plane(cells):
    b = np.zeros((ROWS, COLS), bool)
    for r, c in cells:
        b[r, c] = True
    return jnp.asarray(b)


# ------------------------------------------------------- _has_win windows
def test_win_horizontal_each_row():
    for r in range(ROWS):
        assert bool(_has_win(plane([(r, c) for c in range(3, 7)])))


def test_win_vertical_each_column():
    for c in range(COLS):
        assert bool(_has_win(plane([(r, c) for r in range(2, 6)])))


def test_win_diagonal_down_right():
    assert bool(_has_win(plane([(0, 0), (1, 1), (2, 2), (3, 3)])))
    assert bool(_has_win(plane([(2, 3), (3, 4), (4, 5), (5, 6)])))


def test_win_diagonal_down_left():
    assert bool(_has_win(plane([(0, 6), (1, 5), (2, 4), (3, 3)])))
    assert bool(_has_win(plane([(2, 3), (3, 2), (4, 1), (5, 0)])))


def test_no_win_three_in_a_row():
    assert not bool(_has_win(plane([(5, 0), (5, 1), (5, 2)])))
    assert not bool(_has_win(plane([(3, 3), (4, 3), (5, 3)])))


def test_no_win_broken_line():
    assert not bool(_has_win(plane([(5, 0), (5, 1), (5, 3), (5, 4)])))


def test_no_wraparound_win():
    # 2 at right edge + 2 at left edge on same row must NOT win
    assert not bool(_has_win(plane([(5, 5), (5, 6), (4, 0), (4, 1)])))


# ------------------------------------------------------- game flow
def test_p0_horizontal_win_rewards(env):
    # P0: cols 0,1,2,3; P1: cols 0,1,2
    s = play(env, fresh(env), [0, 0, 1, 1, 2, 2, 3])
    assert bool(s.done)
    assert int(s.winner) == 0
    np.testing.assert_allclose(np.asarray(s.rewards), [1.0, -1.0])


def test_p1_win_rewards(env):
    # P0 wastes col 6; P1 builds col 0 vertical
    s = play(env, fresh(env), [6, 0, 6, 0, 5, 0, 4, 0])
    assert bool(s.done)
    assert int(s.winner) == 1
    np.testing.assert_allclose(np.asarray(s.rewards), [-1.0, 1.0])


def test_outcome_placements(env):
    s = play(env, fresh(env), [0, 0, 1, 1, 2, 2, 3])
    assert np.asarray(env.game_outcome(s)).tolist() == [1, 2]


def test_random_playouts_always_terminate_with_valid_outcome(env):
    for seed in range(8):
        key = jax.random.PRNGKey(seed)
        s = fresh(env, seed=seed)
        for _ in range(ROWS * COLS + 1):
            if bool(s.done):
                break
            mask = np.asarray(env.action_mask(s)).astype(np.float64)
            key, sub = jax.random.split(key)
            a = int(jax.random.choice(sub, COLS, p=jnp.asarray(mask / mask.sum())))
            s = env.step(s, jnp.asarray(a))
        assert bool(s.done)
        r = np.asarray(s.rewards)
        outcome = np.asarray(env.game_outcome(s)).tolist()
        if int(s.winner) == 2:  # draw
            np.testing.assert_allclose(r, [0.0, 0.0])
            assert outcome == [1, 1]
        else:
            assert sorted(r.tolist()) == [-1.0, 1.0]
            assert sorted(outcome) == [1, 2]


def test_full_column_masked(env):
    s = play(env, fresh(env), [3, 3, 3, 3, 3, 3])
    mask = np.asarray(env.action_mask(s))
    assert not mask[3]
    assert mask.sum() == COLS - 1


def test_invalid_move_is_terminal_noop(env):
    s = play(env, fresh(env), [3, 3, 3, 3, 3, 3])
    board_before = np.asarray(s.board).copy()
    cur_before = int(s.current)
    s2 = env.step(s, jnp.asarray(3))  # illegal: column full
    assert bool(s2.done)
    np.testing.assert_array_equal(np.asarray(s2.board), board_before)


def test_obs_dim_and_planes(env):
    s = play(env, fresh(env), [0, 1])
    o = np.asarray(env.obs(s))
    assert o.shape == (86,)
    spatial = o[:84].reshape(ROWS, COLS, 2)
    assert spatial[ROWS - 1, 0, 0] == 1.0  # P0 piece
    assert spatial[ROWS - 1, 1, 1] == 1.0  # P1 piece
    assert spatial.sum() == 2.0
    assert o[84:].tolist() == [1.0, 0.0]  # P0 to move again


def test_eval_temperature_spec(env):
    assert env.spec.eval_temp == pytest.approx(0.4)
    assert env.spec.eval_temp_cutoff == (10, 0.0)


def test_describe_parse(env):
    assert "0" in env.describe_action(0) or "1" in env.describe_action(0)
    for c in range(COLS):
        a = env.parse_action(str(c + 1)) if hasattr(env, "parse_action") else c
        assert 0 <= a < COLS


def test_invalid_move_outcome_is_no_outcome_sentinel(env):
    """A game terminated by an invalid move must NOT report a draw: the
    reference leaves game_over false there (connect_four.rs:256-259), so
    it is excluded from outcome stats. The sentinel is [0, 0]."""
    s = play(env, fresh(env), [3, 3, 3, 3, 3, 3])
    s2 = env.step(s, jnp.asarray(3))  # full column -> invalid, done
    assert bool(s2.done)
    np.testing.assert_array_equal(np.asarray(env.game_outcome(s2)), [0, 0])
    # A genuine draw still reports [1, 1]: fill the board without a win.
    draw_cols = [0,1, 1,0, 2,3, 3,2, 4,5, 5,4, 6,0, 0,6, 1,2, 2,1,
                 3,4, 4,3, 5,6, 6,5, 0,1, 1,0, 2,3, 3,2, 4,5, 5,4, 6,6]
    sd = fresh(env)
    for c in draw_cols:
        if bool(sd.done):
            break
        mask = np.asarray(env.action_mask(sd))
        if not mask[c]:
            c = int(np.nonzero(mask)[0][0])
        sd = env.step(sd, jnp.asarray(c))
    if bool(sd.done) and int(sd.winner) == 2:
        np.testing.assert_array_equal(np.asarray(env.game_outcome(sd)), [1, 1])
