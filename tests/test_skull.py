"""Skull rule tests (reference skull.rs tests: phases, masks, placements)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from burn_ppo_tpu.envs import make_env
from burn_ppo_tpu.envs.skull import (
    A,
    BID_BASE,
    OBS_DIM,
    PASS,
    PLACE_ROSE,
    PLACE_SKULL,
    PRIV_DIM,
    REVEAL_BASE,
)


@pytest.fixture(scope="module")
def env():
    return make_env("skull")  # 4 players default


def fresh(env, seed=0):
    return env.reset(jax.random.PRNGKey(seed))


def BID(n):
    return jnp.asarray(BID_BASE + n - 1, jnp.int32)


def test_spec(env):
    assert env.spec.obs_dim == 135
    assert env.spec.num_actions == 33
    assert env.spec.num_players == 4
    assert env.spec.privileged_obs_dim == 200
    assert env.spec.variable_player_count


def test_player_count_variants():
    for n in (2, 3, 6):
        e = make_env("skull").with_num_players(n)
        assert e.spec.num_players == n
        s = e.reset(jax.random.PRNGKey(0))
        assert e.obs(s).shape == (OBS_DIM,)
        assert e.privileged_obs(s).shape == (PRIV_DIM,)
        mask = np.asarray(e.action_mask(s))
        assert mask[PLACE_SKULL] and mask[PLACE_ROSE]


def test_placing_phase_mask(env):
    s = fresh(env)
    mask = np.asarray(env.action_mask(s))
    assert mask[PLACE_SKULL]
    assert mask[PLACE_ROSE]
    assert not mask[PASS]
    assert not mask[int(BID(1))]  # no card placed yet -> cannot open bid
    assert not mask[REVEAL_BASE:].any()


def test_place_then_can_bid(env):
    s = fresh(env)
    s = env.step(s, jnp.asarray(PLACE_ROSE, jnp.int32))
    assert int(s.current) == 1
    # everyone places one card
    for _ in range(3):
        s = env.step(s, jnp.asarray(PLACE_ROSE, jnp.int32))
    assert int(s.current) == 0
    mask = np.asarray(env.action_mask(s))
    assert mask[int(BID(1))] and mask[int(BID(4))]
    assert not mask[int(BID(5))]  # only 4 cards placed


def test_bid_equal_total_goes_straight_to_reveal(env):
    s = fresh(env)
    for _ in range(4):
        s = env.step(s, jnp.asarray(PLACE_ROSE, jnp.int32))
    s = env.step(s, BID(4))  # bid == total cards -> revealing
    assert int(s.phase) == 2
    assert int(s.current) == 0  # bidder reveals
    mask = np.asarray(env.action_mask(s))
    # must reveal own stack first
    assert mask[REVEAL_BASE + 0]
    assert not mask[REVEAL_BASE + 1]


def test_bidding_pass_chain_ends_in_reveal(env):
    s = fresh(env)
    for _ in range(4):
        s = env.step(s, jnp.asarray(PLACE_ROSE, jnp.int32))
    s = env.step(s, BID(1))  # P0 opens with 1 < 4
    assert int(s.phase) == 1
    assert int(s.current) == 1
    for _ in range(3):  # P1, P2, P3 pass
        s = env.step(s, jnp.asarray(PASS, jnp.int32))
    assert int(s.phase) == 2
    assert int(s.current_bidder) == 0
    assert int(s.current) == 0


def test_reveal_own_roses_success(env):
    # All place roses; P0 bids 2; others pass; P0 reveals own rose, then
    # must_reveal_own is cleared after their stack (1 card) is exhausted,
    # then reveals P1's rose -> success, win count 1, new round starts.
    s = fresh(env)
    for _ in range(4):
        s = env.step(s, jnp.asarray(PLACE_ROSE, jnp.int32))
    s = env.step(s, BID(2))
    for _ in range(3):
        s = env.step(s, jnp.asarray(PASS, jnp.int32))
    s = env.step(s, jnp.asarray(REVEAL_BASE + 0, jnp.int32))  # own rose
    assert int(s.roses_found) == 1
    assert not bool(s.must_reveal_own)
    s = env.step(s, jnp.asarray(REVEAL_BASE + 1, jnp.int32))  # P1 rose
    # success: 2 roses >= bid 2 -> win, new round, P0 starts
    assert int(s.wins[0]) == 1
    assert int(s.phase) == 0
    assert int(s.current) == 0
    assert not bool(s.done)


def test_reveal_skull_loses_coaster(env):
    # P0 places their skull; P1-P3 roses; P1 bids 4 (total) -> reveals own
    # first then P0's skull -> P1 loses a coaster.
    s = fresh(env)
    s = env.step(s, jnp.asarray(PLACE_SKULL, jnp.int32))  # P0 skull
    for _ in range(3):
        s = env.step(s, jnp.asarray(PLACE_ROSE, jnp.int32))
    # Back to P0 (placing). P0 opens bid 1; P1 raises to 4 (=total) ->
    # straight to revealing with P1 as bidder.
    s = env.step(s, BID(1))
    s = env.step(s, BID(4))
    assert int(s.phase) == 2 and int(s.current_bidder) == 1
    s = env.step(s, jnp.asarray(REVEAL_BASE + 1, jnp.int32))  # own rose
    coasters_before = 4
    s = env.step(s, jnp.asarray(REVEAL_BASE + 0, jnp.int32))  # P0's skull!
    from burn_ppo_tpu.envs.skull import Skull

    total_after = int(s.has_trap[1]) + int(s.rose_count[1])
    assert total_after == coasters_before - 1
    # new round started, bidder (still alive) starts
    assert int(s.phase) == 0
    assert int(s.current) == 1
    assert not bool(s.done)


def test_two_wins_ends_game(env):
    jit_step = jax.jit(env.step)

    def play_success_round(s):
        # all place roses, current starter bids 1, others pass, reveal own
        starter = int(s.current)
        for _ in range(4):
            s = jit_step(s, jnp.asarray(PLACE_ROSE, jnp.int32))
        s = jit_step(s, BID(1))
        for _ in range(3):
            s = jit_step(s, jnp.asarray(PASS, jnp.int32))
        s = jit_step(s, jnp.asarray(REVEAL_BASE + starter, jnp.int32))
        return s

    s = fresh(env)
    s = play_success_round(s)
    assert int(s.wins[0]) == 1 and not bool(s.done)
    s = play_success_round(s)  # P0 starts again (won last round)
    assert bool(s.done)
    assert int(s.winner) == 0
    rewards = np.asarray(s.rewards)
    assert rewards[0] == pytest.approx(1.0)
    placements = np.asarray(env.game_outcome(s))
    assert placements[0] == 1
    # P1-P3 all tie on (wins=0, coasters=4, not eliminated) -> shared 2nd
    assert (placements[1:] == 2).all()
    # tie-averaged reward for positions 2,3,4 of 4: mean of (1/3, -1/3, -1)
    assert rewards[1] == pytest.approx((1 / 3 - 1 / 3 - 1.0) / 3, abs=1e-5)


def test_random_playout_terminates(env):
    from burn_ppo_tpu.ops.categorical import apply_action_mask, sample_categorical

    jit_step = jax.jit(env.step)
    key = jax.random.PRNGKey(1)
    s = fresh(env, seed=5)
    for t in range(3000):
        if bool(s.done):
            break
        key, k = jax.random.split(key)
        mask = env.action_mask(s)
        assert bool(mask.any()), f"empty mask at t={t}, phase={int(s.phase)}"
        logits = apply_action_mask(jnp.zeros((1, A)), mask[None, :])
        a = sample_categorical(k, logits)[0]
        s = jit_step(s, a)
    assert bool(s.done)
    placements = np.asarray(env.game_outcome(s))
    assert placements.min() == 1
    assert ((placements >= 1) & (placements <= 4)).all()
    rewards = np.asarray(s.rewards)
    assert rewards.max() <= 1.0 + 1e-6 and rewards.min() >= -1.0 - 1e-6


def test_obs_phase_and_hand(env):
    s = fresh(env)
    obs = np.asarray(env.obs(s))
    # own hand: [has_skull, rose, rose, rose]
    np.testing.assert_array_equal(obs[:4], [1, 1, 1, 1])
    # phase one-hot at offset 4+4+6*5 = 38..41 -> placing
    phase_off = 4 + 4 + 6 + 6 + 6 + 6 + 6
    np.testing.assert_array_equal(obs[phase_off : phase_off + 3], [1, 0, 0])
    # num players one-hot (4 players -> index 2 of 5)
    np_off = OBS_DIM - 8 * 8 - 5
    np.testing.assert_array_equal(obs[np_off : np_off + 5], [0, 0, 1, 0, 0])


def test_skull_training_smoke(tmp_path):
    from burn_ppo_tpu.config import Config
    from burn_ppo_tpu.schedule import Schedule
    from burn_ppo_tpu.train import Trainer

    cfg = Config(
        env="skull",
        num_envs=4,
        num_steps=16,
        total_steps=128,
        hidden_size=16,
        num_hidden=1,
        learning_rate=Schedule.constant(1e-3),
        checkpoint_freq=128,
        log_freq=64,
        seed=21,
        opponent_pool_fraction=0.0,
        player_count={"mode": "fixed", "count": 4},
    )
    trainer = Trainer(cfg, tmp_path / "run", quiet=True)
    summary = trainer.train()
    assert summary["final_step"] >= 128


def test_skull_ctde_three_players(tmp_path):
    from burn_ppo_tpu.config import Config
    from burn_ppo_tpu.train import Trainer

    cfg = Config(
        env="skull",
        network_type="ctde",
        num_envs=4,
        num_steps=16,
        total_steps=128,
        hidden_size=16,
        num_hidden=1,
        checkpoint_freq=128,
        log_freq=64,
        seed=22,
        opponent_pool_fraction=0.0,
        player_count={"mode": "fixed", "count": 3},
    )
    trainer = Trainer(cfg, tmp_path / "run", quiet=True)
    assert trainer.num_players == 3
    summary = trainer.train()
    assert summary["final_step"] >= 128
