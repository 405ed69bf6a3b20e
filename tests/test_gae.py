"""GAE tests with the reference's hand-computed vectors
(src/ppo.rs:2146-2736)."""

import jax.numpy as jnp
import numpy as np
import pytest

from burn_ppo_tpu.ops.gae import (
    compute_explained_variance,
    compute_gae,
    compute_gae_multiplayer,
)


def test_gae_single_player_hand_computed():
    # T=2, E=1: r=[1, 1], v=[0.5, 0.6], no dones, bootstrap 0.7
    rewards = jnp.array([[1.0], [1.0]])
    values = jnp.array([[0.5], [0.6]])
    dones = jnp.zeros((2, 1))
    last = jnp.array([0.7])
    gamma, lam = 0.99, 0.95
    adv, ret = compute_gae(rewards, values, dones, last, gamma, lam)

    d1 = 1.0 + gamma * 0.7 - 0.6
    a1 = d1
    d0 = 1.0 + gamma * 0.6 - 0.5
    a0 = d0 + gamma * lam * a1
    np.testing.assert_allclose(np.asarray(adv[:, 0]), [a0, a1], rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(ret[:, 0]), [a0 + 0.5, a1 + 0.6], rtol=1e-5
    )


def test_gae_done_blocks_bootstrap():
    rewards = jnp.array([[1.0], [1.0]])
    values = jnp.array([[0.5], [0.6]])
    dones = jnp.array([[1.0], [0.0]])
    last = jnp.array([10.0])
    gamma, lam = 0.99, 0.95
    adv, _ = compute_gae(rewards, values, dones, last, gamma, lam)
    # step 0 terminal: delta = 1 - 0.5, no bootstrap, no carry from step 1
    assert float(adv[0, 0]) == pytest.approx(0.5, abs=1e-5)


def test_gae_multi_env_isolation():
    rewards = jnp.array([[1.0, 0.0], [0.0, 5.0]])
    values = jnp.zeros((2, 2))
    dones = jnp.zeros((2, 2))
    last = jnp.zeros(2)
    adv, _ = compute_gae(rewards, values, dones, last, 0.99, 0.95)
    adv_solo0, _ = compute_gae(
        rewards[:, :1], values[:, :1], dones[:, :1], last[:1], 0.99, 0.95
    )
    np.testing.assert_allclose(np.asarray(adv[:, 0]), np.asarray(adv_solo0[:, 0]))


# ---------------------------------------------------------------------------
# Multiplayer vectors from the reference test suite
# ---------------------------------------------------------------------------
def test_multiplayer_same_player_consecutive():
    # Reference test_gae_multiplayer_same_player_consecutive (ppo.rs:2232)
    gamma, lam = 0.99, 0.95
    all_rewards = jnp.array([[[0.0, 0.0]], [[1.0, 0.0]]])
    values = jnp.array([[0.5], [0.8]])
    dones = jnp.array([[0.0], [1.0]])
    acting = jnp.array([[0], [0]], dtype=jnp.int32)
    last_vpp = jnp.array([[0.8, 0.0]])
    adv, _ = compute_gae_multiplayer(
        all_rewards, values, dones, acting, last_vpp, gamma, lam
    )
    expected_step1 = 1.0 - 0.8
    delta0 = gamma * 0.8 - 0.5
    expected_step0 = delta0 + gamma * lam * expected_step1
    assert float(adv[1, 0]) == pytest.approx(expected_step1, abs=1e-5)
    assert float(adv[0, 0]) == pytest.approx(expected_step0, abs=1e-5)


def test_multiplayer_different_player_terminal_no_bleed():
    # Reference ppo.rs:2286 — P0's Episode-1 advantage must not bootstrap
    # from Episode 2's high value.
    all_rewards = jnp.array([[[0.0, 0.0]], [[-1.0, 1.0]], [[1.0, -1.0]]])
    values = jnp.array([[0.0], [0.0], [0.9]])
    dones = jnp.array([[0.0], [1.0], [1.0]])
    acting = jnp.array([[0], [1], [0]], dtype=jnp.int32)
    last_vpp = jnp.array([[0.9, 0.0]])
    adv, _ = compute_gae_multiplayer(
        all_rewards, values, dones, acting, last_vpp, 0.99, 0.95
    )
    assert float(adv[0, 0]) < -0.9, "Episode 2 value bled into Episode 1"


def test_multiplayer_reward_attribution_boundary():
    # Reference ppo.rs:2345 — rewards don't bleed across episodes.
    all_rewards = jnp.array(
        [[[0.0, 0.0]], [[-1.0, 1.0]], [[0.0, 0.0]], [[10.0, -10.0]]]
    )
    values = jnp.zeros((4, 1))
    dones = jnp.array([[0.0], [1.0], [0.0], [1.0]])
    acting = jnp.array([[0], [1], [0], [1]], dtype=jnp.int32)
    last_vpp = jnp.zeros((1, 2))
    adv, _ = compute_gae_multiplayer(
        all_rewards, values, dones, acting, last_vpp, 0.99, 0.95
    )
    assert float(adv[0, 0]) < 0.0  # P0 episode 1: lost
    assert float(adv[1, 0]) > 0.0  # P1 episode 1: won
    assert float(adv[2, 0]) > 5.0  # P0 episode 2: +10 attributed


def test_multiplayer_three_players():
    # Reference ppo.rs (three players): only P2 wins at terminal.
    all_rewards = jnp.array(
        [[[0.0, 0.0, 0.0]], [[0.0, 0.0, 0.0]], [[-1.0, -1.0, 2.0]]]
    )
    values = jnp.zeros((3, 1))
    dones = jnp.array([[0.0], [0.0], [1.0]])
    acting = jnp.array([[0], [1], [2]], dtype=jnp.int32)
    last_vpp = jnp.zeros((1, 3))
    adv, _ = compute_gae_multiplayer(
        all_rewards, values, dones, acting, last_vpp, 0.99, 0.95
    )
    assert float(adv[0, 0]) < 0.0
    assert float(adv[1, 0]) < 0.0
    assert float(adv[2, 0]) > 0.0


def test_multiplayer_reward_attribution_exact():
    # Hand-computed: P0 acts at t0, P1 at t1 (terminal, rewards [-1, +1]).
    # P0's attributed reward at t0 = -1 (carried from t1), no bootstrap.
    gamma, lam = 0.9, 0.8
    all_rewards = jnp.array([[[0.0, 0.0]], [[-1.0, 1.0]]])
    values = jnp.array([[0.2], [0.3]])
    dones = jnp.array([[0.0], [1.0]])
    acting = jnp.array([[0], [1]], dtype=jnp.int32)
    last_vpp = jnp.zeros((1, 2))
    adv, ret = compute_gae_multiplayer(
        all_rewards, values, dones, acting, last_vpp, gamma, lam
    )
    # t1 (P1, terminal): delta = 1 - 0.3 = 0.7
    assert float(adv[1, 0]) == pytest.approx(0.7, abs=1e-6)
    # t0 (P0): attributed = 0 + carry(-1) = -1. done=0 but P0's next_value
    # was reset at the terminal step => delta = -1 + gamma*0 - 0.2 = -1.2.
    # gae carry for P0 is 0 (P1 owns the t1 advantage) => adv = -1.2
    assert float(adv[0, 0]) == pytest.approx(-1.2, abs=1e-6)
    np.testing.assert_allclose(
        np.asarray(ret[:, 0]), [-1.0, 1.0], atol=1e-6
    )


def test_multiplayer_no_done_bootstraps_per_player():
    # No terminal: both players bootstrap from their own last values.
    gamma, lam = 0.99, 0.95
    all_rewards = jnp.zeros((2, 1, 2))
    values = jnp.array([[0.4], [0.6]])
    dones = jnp.zeros((2, 1))
    acting = jnp.array([[0], [1]], dtype=jnp.int32)
    last_vpp = jnp.array([[0.5, 0.7]])
    adv, _ = compute_gae_multiplayer(
        all_rewards, values, dones, acting, last_vpp, gamma, lam
    )
    # t1 (P1): delta = 0 + gamma*0.7 - 0.6
    assert float(adv[1, 0]) == pytest.approx(gamma * 0.7 - 0.6, abs=1e-6)
    # t0 (P0): delta = 0 + gamma*0.5 - 0.4 (P0's own bootstrap, carry 0)
    assert float(adv[0, 0]) == pytest.approx(gamma * 0.5 - 0.4, abs=1e-6)


def test_multiplayer_multi_env_isolation():
    all_rewards = jnp.array(
        [[[0.0, 0.0], [5.0, -5.0]], [[-1.0, 1.0], [0.0, 0.0]]]
    )
    values = jnp.zeros((2, 2))
    dones = jnp.array([[0.0, 1.0], [1.0, 0.0]])
    acting = jnp.array([[0, 0], [1, 1]], dtype=jnp.int32)
    last_vpp = jnp.zeros((2, 2))
    adv_both, _ = compute_gae_multiplayer(
        all_rewards, values, dones, acting, last_vpp, 0.99, 0.95
    )
    adv_e0, _ = compute_gae_multiplayer(
        all_rewards[:, :1],
        values[:, :1],
        dones[:, :1],
        acting[:, :1],
        last_vpp[:1],
        0.99,
        0.95,
    )
    np.testing.assert_allclose(
        np.asarray(adv_both[:, 0]), np.asarray(adv_e0[:, 0]), atol=1e-6
    )


def test_explained_variance():
    v = jnp.array([1.0, 2.0, 3.0, 4.0])
    assert float(compute_explained_variance(v, v)) == pytest.approx(1.0)
    r = jnp.array([1.0, 2.0, 3.0, 4.0])
    bad = jnp.array([4.0, 1.0, 7.0, -2.0])
    assert float(compute_explained_variance(bad, r)) < 0.0
    const = jnp.ones(4)
    assert float(compute_explained_variance(v, const)) == 0.0


def test_explained_variance_masked():
    v = jnp.array([1.0, 2.0, 100.0])
    r = jnp.array([1.0, 2.0, -100.0])
    mask = jnp.array([1.0, 1.0, 0.0])
    assert float(compute_explained_variance(v, r, mask)) == pytest.approx(
        1.0, abs=1e-5
    )
