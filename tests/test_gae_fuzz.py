"""GAE fuzz tests: the vectorized reverse scans vs slow per-env Python
loops over random scenarios (the reference's hand-computed vectors in
tests/test_gae.py pin the semantics; this guards the vectorization)."""

import jax.numpy as jnp
import numpy as np
import pytest

from burn_ppo_tpu.ops.gae import compute_gae, compute_gae_multiplayer


def slow_gae(rewards, values, dones, last_values, gamma, lam):
    T, E = rewards.shape
    adv = np.zeros((T, E))
    for e in range(E):
        nv = last_values[e]
        g = 0.0
        for t in reversed(range(T)):
            nd = 1.0 - dones[t, e]
            delta = rewards[t, e] + gamma * nv * nd - values[t, e]
            g = delta + gamma * lam * nd * g
            adv[t, e] = g
            nv = values[t, e]
    return adv


def slow_multiplayer_gae(all_r, values, dones, acting, last_vpp, gamma, lam):
    T, E, P = all_r.shape
    adv = np.zeros((T, E))
    for e in range(E):
        reward_carry = np.zeros(P)
        gae = np.zeros(P)
        next_value = last_vpp[e].astype(np.float64).copy()
        for t in reversed(range(T)):
            done = float(dones[t, e])
            a = int(acting[t, e])
            if done > 0.5:
                reward_carry[:] = 0.0
                gae[:] = 0.0
                keep = next_value[a]
                next_value[:] = 0.0
                next_value[a] = keep
            attributed = all_r[t, e, a] + reward_carry[a]
            reward_carry[a] = 0.0
            for p in range(P):
                if p != a:
                    reward_carry[p] += all_r[t, e, p]
            nd = 1.0 - done
            delta = attributed + gamma * next_value[a] * nd - values[t, e]
            advantage = delta + gamma * lam * nd * gae[a]
            gae[a] = advantage
            next_value[a] = values[t, e]
            adv[t, e] = advantage
    return adv


@pytest.mark.parametrize("seed", range(5))
def test_fuzz_single_player(seed):
    rng = np.random.default_rng(seed)
    T, E = 17, 6
    rewards = rng.normal(size=(T, E)).astype(np.float32)
    values = rng.normal(size=(T, E)).astype(np.float32)
    dones = (rng.random((T, E)) < 0.15).astype(np.float32)
    last = rng.normal(size=(E,)).astype(np.float32)
    gamma, lam = 0.97, 0.9
    adv, ret = compute_gae(
        jnp.asarray(rewards), jnp.asarray(values), jnp.asarray(dones),
        jnp.asarray(last), gamma, lam,
    )
    expect = slow_gae(rewards, values, dones, last, gamma, lam)
    np.testing.assert_allclose(np.asarray(adv), expect, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(ret), expect + values, rtol=1e-4, atol=1e-5
    )


@pytest.mark.parametrize("seed,P", [(0, 2), (1, 2), (2, 4), (3, 4), (4, 3)])
def test_fuzz_multiplayer(seed, P):
    rng = np.random.default_rng(seed + 100)
    T, E = 23, 5
    all_r = rng.normal(size=(T, E, P)).astype(np.float32)
    values = rng.normal(size=(T, E)).astype(np.float32)
    dones = (rng.random((T, E)) < 0.2).astype(np.float32)
    # round-robin-ish acting order with random skips (eliminations)
    acting = rng.integers(0, P, size=(T, E)).astype(np.int32)
    last_vpp = rng.normal(size=(E, P)).astype(np.float32)
    gamma, lam = 0.99, 0.95
    adv, ret = compute_gae_multiplayer(
        jnp.asarray(all_r), jnp.asarray(values), jnp.asarray(dones),
        jnp.asarray(acting), jnp.asarray(last_vpp), gamma, lam,
    )
    expect = slow_multiplayer_gae(all_r, values, dones, acting, last_vpp, gamma, lam)
    np.testing.assert_allclose(np.asarray(adv), expect, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(ret), expect + values, rtol=1e-4, atol=1e-4
    )


def test_multiplayer_reduces_to_single_when_one_player():
    rng = np.random.default_rng(7)
    T, E = 12, 4
    rewards = rng.normal(size=(T, E)).astype(np.float32)
    values = rng.normal(size=(T, E)).astype(np.float32)
    dones = (rng.random((T, E)) < 0.2).astype(np.float32)
    last = rng.normal(size=(E,)).astype(np.float32)
    a1, _ = compute_gae(
        jnp.asarray(rewards), jnp.asarray(values), jnp.asarray(dones),
        jnp.asarray(last), 0.99, 0.95,
    )
    a2, _ = compute_gae_multiplayer(
        jnp.asarray(rewards)[..., None], jnp.asarray(values),
        jnp.asarray(dones), jnp.zeros((T, E), jnp.int32),
        jnp.asarray(last)[:, None], 0.99, 0.95,
    )
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), rtol=1e-5, atol=1e-6)
