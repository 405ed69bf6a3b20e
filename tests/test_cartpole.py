"""CartPole env tests (reference src/envs/cartpole.rs tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from burn_ppo_tpu.envs import make_env
from burn_ppo_tpu.envs.base import EpisodeAccumulator, autoreset_step


def test_reset_obs():
    env = make_env("cartpole")
    s = env.reset(jax.random.PRNGKey(42))
    obs = env.obs(s)
    assert obs.shape == (5,)
    # initial state within +/-0.05, time feature 0
    assert np.all(np.abs(np.asarray(obs[:4])) <= 0.05)
    assert float(obs[4]) == 0.0
    assert not bool(s.done)


def test_step_reward_and_time_feature():
    env = make_env("cartpole")
    s = env.reset(jax.random.PRNGKey(0))
    s1 = env.step(s, jnp.array(1, jnp.int32))
    assert float(s1.rewards[0]) == 1.0
    assert int(s1.step_idx) == 1
    obs = env.obs(s1)
    assert float(obs[4]) == pytest.approx(1.0 / 500.0)


def test_determinism():
    env = make_env("cartpole")
    s_a = env.reset(jax.random.PRNGKey(7))
    s_b = env.reset(jax.random.PRNGKey(7))
    for _ in range(10):
        s_a = env.step(s_a, jnp.array(1, jnp.int32))
        s_b = env.step(s_b, jnp.array(1, jnp.int32))
    np.testing.assert_allclose(float(s_a.x), float(s_b.x))
    np.testing.assert_allclose(float(s_a.theta), float(s_b.theta))


def test_push_right_moves_cart_right():
    env = make_env("cartpole")
    s = env.reset(jax.random.PRNGKey(3))
    start_x = float(s.x)
    for _ in range(20):
        s = env.step(s, jnp.array(1, jnp.int32))
    assert float(s.x) > start_x


def test_terminates_on_constant_push():
    env = make_env("cartpole")
    s = env.reset(jax.random.PRNGKey(5))
    jit_step = jax.jit(env.step)
    done_at = None
    for t in range(500):
        s = jit_step(s, jnp.array(0, jnp.int32))
        if bool(s.done):
            done_at = t + 1
            break
    assert done_at is not None and done_at < 200
    # failure terminal pays 0 reward (cartpole.rs:294-298)
    assert float(s.rewards[0]) == 0.0


def test_autoreset_captures_episode():
    env = make_env("cartpole")
    s = env.reset(jax.random.PRNGKey(5))
    acc = EpisodeAccumulator.zero(1)
    key = jax.random.PRNGKey(99)
    total = 0.0
    for t in range(500):
        key, rk = jax.random.split(key)
        s, acc, terminal, log = autoreset_step(
            env, s, acc, jnp.array(0, jnp.int32), rk
        )
        if bool(log.completed):
            # length matches steps taken; rewards = length - 1 (last step 0)
            assert int(log.length) == t + 1
            assert float(log.total_rewards[0]) == pytest.approx(t)
            # state was auto-reset
            assert int(s.step_idx) == 0
            assert not bool(s.done)
            return
    pytest.fail("episode never completed")


def test_vmapped_envs_differ():
    env = make_env("cartpole")
    keys = jax.random.split(jax.random.PRNGKey(0), 8)
    states = jax.vmap(env.reset)(keys)
    xs = np.asarray(states.x)
    assert len(np.unique(xs)) == 8
