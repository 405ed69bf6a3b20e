"""Rollout collection tests: self-play scan semantics and the vs-pool
stacked-opponent path (reference ppo.rs:213-500 / 537-1063 tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from burn_ppo_tpu.envs import make_env
from burn_ppo_tpu.models.network import make_network
from burn_ppo_tpu.ppo.normalization import ObsNormState, obs_norm_update
from burn_ppo_tpu.ppo.pool_rollout import (
    PoolSeating,
    collect_rollouts_with_opponents,
)
from burn_ppo_tpu.ppo.rollout import (
    bootstrap_values,
    collect_rollouts,
    init_rollout_carry,
)


def biased_params(net, key, action):
    """Params whose policy head overwhelmingly prefers ``action``."""
    p = net.init(key)
    bias = p["policy_head"]["bias"]
    p["policy_head"]["bias"] = jnp.zeros_like(bias).at[action].set(50.0)
    p["policy_head"]["kernel"] = jnp.zeros_like(p["policy_head"]["kernel"])
    return p


@pytest.fixture(scope="module")
def cartpole_setup():
    env = make_env("cartpole")
    net = make_network(env.spec, network_type="mlp", hidden_size=16,
                       num_hidden=1, activation="tanh")
    params = net.init(jax.random.PRNGKey(0))
    carry = init_rollout_carry(env, 8, jax.random.PRNGKey(1))
    return env, net, params, carry


def run(env, net, params, carry, obs_norm=None, **kw):
    fn = jax.jit(
        lambda p, c, on: collect_rollouts(
            net, env, p, c, on, None, num_steps=16, gamma=0.99,
            normalize_returns=kw.get("normalize_returns", False),
        )
    )
    return fn(params, carry, obs_norm)


def test_batch_shapes(cartpole_setup):
    env, net, params, carry = cartpole_setup
    c2, batch, logs = run(env, net, params, carry)
    assert batch.obs.shape == (16, 8, 5)
    assert batch.actions.shape == (16, 8)
    assert batch.values.shape == (16, 8)
    assert batch.all_rewards.shape == (16, 8, 1)
    assert logs.completed.shape == (16, 8)


def test_valid_mask_all_ones_selfplay(cartpole_setup):
    env, net, params, carry = cartpole_setup
    _c, batch, _l = run(env, net, params, carry)
    assert np.asarray(batch.valid_mask).all()


def test_obs_stored_raw_with_lagged_normalizer(cartpole_setup):
    """The batch stores RAW obs; normalization happens at use sites with
    lagged stats (ppo.rs:262-293, 495-497)."""
    env, net, params, carry = cartpole_setup
    on = ObsNormState.create(5)
    # warm the normalizer with shifted fake stats
    on = obs_norm_update(on, jnp.ones((4, 64, 5)) * 3.0)
    _c, b_norm, _ = run(env, net, params, carry, obs_norm=on)
    _c, b_raw, _ = run(env, net, params, carry, obs_norm=None)
    # raw obs identical regardless of normalizer (actions may differ, so
    # compare the first step only, before trajectories diverge)
    np.testing.assert_allclose(
        np.asarray(b_norm.obs[0]), np.asarray(b_raw.obs[0]), atol=1e-6
    )


def test_determinism_same_key(cartpole_setup):
    env, net, params, carry = cartpole_setup
    _c, b1, _ = run(env, net, params, carry)
    _c, b2, _ = run(env, net, params, carry)
    np.testing.assert_array_equal(np.asarray(b1.actions), np.asarray(b2.actions))
    np.testing.assert_allclose(np.asarray(b1.rewards), np.asarray(b2.rewards))


def test_return_normalization_scales_rewards(cartpole_setup):
    env, net, params, carry = cartpole_setup
    _c, b_off, _ = run(env, net, params, carry, normalize_returns=False)
    _c, b_on, _ = run(env, net, params, carry, normalize_returns=True)
    # CartPole rewards are all 1.0 raw; normalized must differ once the
    # return variance estimate kicks in.
    assert np.asarray(b_off.rewards).max() == 1.0
    assert not np.allclose(np.asarray(b_on.rewards), np.asarray(b_off.rewards))


def test_carry_advances(cartpole_setup):
    env, net, params, carry = cartpole_setup
    c2, _b, _l = run(env, net, params, carry)
    assert not np.array_equal(np.asarray(c2.key), np.asarray(carry.key))
    # env states advanced: step counters moved
    assert not np.allclose(
        np.asarray(c2.env_states.step_idx), np.asarray(carry.env_states.step_idx)
    )


def test_bootstrap_refreshes_current_player_slot():
    env = make_env("connect_four")
    net = make_network(env.spec, network_type="mlp", hidden_size=16,
                       num_hidden=1, activation="tanh")
    params = net.init(jax.random.PRNGKey(0))
    carry = init_rollout_carry(env, 4, jax.random.PRNGKey(1))
    # plant recognizable stale values
    carry = carry.replace(
        last_value_per_player=jnp.full((4, 2), -77.0, jnp.float32)
    )
    values, lvpp = jax.jit(
        lambda p, c: bootstrap_values(net, env, p, c, None, None)
    )(params, carry)
    players = np.asarray(jax.vmap(env.current_player)(carry.env_states))
    lvpp = np.asarray(lvpp)
    for e in range(4):
        cur = players[e]
        assert lvpp[e, cur] != -77.0  # refreshed
        assert lvpp[e, 1 - cur] == -77.0  # other slot untouched


# ----------------------------------------------------------- vs-pool path
@pytest.fixture(scope="module")
def pool_setup():
    env = make_env("connect_four")
    net = make_network(env.spec, network_type="mlp", hidden_size=16,
                       num_hidden=1, activation="tanh")
    learner = biased_params(net, jax.random.PRNGKey(0), action=1)
    opp_a = biased_params(net, jax.random.PRNGKey(1), action=0)
    opp_b = biased_params(net, jax.random.PRNGKey(2), action=2)
    stacked = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), opp_a, opp_b
    )
    return env, net, learner, stacked


def run_pool(env, net, learner, stacked, E=6, L=2, T=12, seed=3):
    carry = init_rollout_carry(env, E, jax.random.PRNGKey(seed))
    seating = PoolSeating.create(E, L, env.spec.num_players, num_slots=2,
                                 key=jax.random.PRNGKey(seed + 1))
    fn = jax.jit(
        lambda p, o, c, s: collect_rollouts_with_opponents(
            net, env, p, o, None, c, s, None, None,
            num_steps=T, num_learner_envs=L, num_slots=2,
        )
    )
    return seating, fn(learner, stacked, carry, seating)


def test_pool_valid_mask_learner_turns_only(pool_setup):
    env, net, learner, stacked = pool_setup
    seating, (carry, seat_out, batch, logs) = run_pool(env, net, learner, stacked)
    valid = np.asarray(batch.valid_mask)  # [T, E]
    players = np.asarray(batch.acting_players)
    seats = np.asarray(logs.learner_seat)  # [T, E] pre-reseat
    L = 2
    # self-play envs always valid
    assert valid[:, :L].all()
    # pool envs valid exactly on learner turns
    np.testing.assert_array_equal(
        valid[:, L:], (players[:, L:] == seats[:, L:]).astype(np.float32)
    )


def test_pool_opponent_actions_used_on_their_turns(pool_setup):
    env, net, learner, stacked = pool_setup
    seating, (carry, seat_out, batch, logs) = run_pool(env, net, learner, stacked)
    actions = np.asarray(batch.actions)
    players = np.asarray(batch.acting_players)
    seats = np.asarray(logs.learner_seat)
    slots = np.asarray(logs.seat_opp)  # [T, E, P]
    masks = np.asarray(batch.action_masks)
    L = 2
    T, E = actions.shape
    for t in range(T):
        for e in range(E):
            p = players[t, e]
            preferred = {0: 0, 1: 2}  # slot -> biased column
            if e < L or p == seats[t, e]:
                want = 1  # learner prefers column 1
            else:
                want = preferred[int(slots[t, e, p])]
            if masks[t, e, want] > 0:  # biased column legal
                assert actions[t, e] == want, (t, e, p)


def test_pool_reseat_only_on_done(pool_setup):
    env, net, learner, stacked = pool_setup
    seating, (carry, seat_out, batch, logs) = run_pool(env, net, learner, stacked)
    dones = np.asarray(batch.dones)  # [T, E]
    seats = np.asarray(logs.learner_seat)  # [T, E] (pre-reseat at step t)
    L = 2
    T, E = dones.shape
    for e in range(L, E):
        for t in range(T - 1):
            if dones[t, e] == 0.0:
                assert seats[t + 1, e] == seats[t, e]
    # self-play envs never get a seat
    assert (seats[:, :L] == -1).all()


def test_pool_capture_before_reseat_vectors(pool_setup):
    """Placement capture happens BEFORE reseat/resample (ppo.rs:871-917):
    at a done step, the logged seat/slots are the ones the finished
    episode was played with; new seats/slots only show from t+1."""
    env, net, learner, stacked = pool_setup
    seating, (carry, seat_out, batch, logs) = run_pool(
        env, net, learner, stacked, T=24, seed=11
    )
    dones = np.asarray(batch.dones)
    seats = np.asarray(logs.learner_seat)  # [T, E]
    slots = np.asarray(logs.seat_opp)  # [T, E, P]
    completed = np.asarray(logs.episode.completed if hasattr(logs, "episode")
                           else logs.completed)
    L = 2
    T, E = dones.shape
    saw_done_mid = False
    for e in range(L, E):
        for t in range(1, T):
            if dones[t, e] == 1.0 and dones[t - 1, e] == 0.0:
                saw_done_mid = True
                # The logged seat at the done step is the episode's seat.
                assert seats[t, e] == seats[t - 1, e], (t, e)
                np.testing.assert_array_equal(slots[t, e], slots[t - 1, e])
    assert saw_done_mid, "test vectors never saw an episode finish"


def test_pool_slot_resample_only_on_done(pool_setup):
    env, net, learner, stacked = pool_setup
    seating, (carry, seat_out, batch, logs) = run_pool(
        env, net, learner, stacked, T=24, seed=12
    )
    dones = np.asarray(batch.dones)
    slots = np.asarray(logs.seat_opp)
    T, E = dones.shape
    for e in range(E):
        for t in range(T - 1):
            if dones[t, e] == 0.0:
                np.testing.assert_array_equal(
                    slots[t + 1, e], slots[t, e], err_msg=f"t={t} e={e}"
                )


def test_pool_values_are_learner_values(pool_setup):
    """Opponents contribute actions only; the recorded values come from
    the learner critic (biased params have zero kernels -> constant
    value regardless of obs, shared across all envs)."""
    env, net, learner, stacked = pool_setup
    seating, (carry, seat_out, batch, logs) = run_pool(env, net, learner, stacked)
    values = np.asarray(batch.values)
    # Learner value head is the same function everywhere; pool envs must
    # match self-play envs' value distribution (identical constant net).
    assert values.std() < 10.0  # sanity: finite
    assert np.isfinite(values).all()


def test_pool_return_normalization_learner_gated(pool_setup):
    """Reference pool semantics (ppo.rs:952-996): with normalize_returns
    the rolling return advances every step, variance stats fold on
    LEARNER turns only, and the normalized acting reward lands in both
    batch.rewards and the acting slot of all_rewards."""
    env, net, learner, stacked = pool_setup
    E, L, T = 6, 2, 12
    carry = init_rollout_carry(env, E, jax.random.PRNGKey(3))
    seating = PoolSeating.create(E, L, env.spec.num_players, num_slots=2,
                                 key=jax.random.PRNGKey(4))
    fn = jax.jit(
        lambda p, o, c, s: collect_rollouts_with_opponents(
            net, env, p, o, None, c, s, None, None,
            num_steps=T, num_learner_envs=L, num_slots=2,
            gamma=0.97, normalize_returns=True,
        )
    )
    carry_out, seat_out, batch, logs = fn(learner, stacked, carry, seating)
    # Stats folded exactly one sample per learner turn.
    assert float(carry_out.return_norm.count) == pytest.approx(
        float(np.asarray(batch.valid_mask).sum())
    )
    # Acting slot of all_rewards carries the (normalized) acting reward.
    players = np.asarray(batch.acting_players)
    ar = np.asarray(batch.all_rewards)
    acting = np.take_along_axis(ar, players[..., None], axis=-1)[..., 0]
    np.testing.assert_allclose(acting, np.asarray(batch.rewards), rtol=1e-6)

    # Without normalization the state must stay untouched.
    fn_off = jax.jit(
        lambda p, o, c, s: collect_rollouts_with_opponents(
            net, env, p, o, None, c, s, None, None,
            num_steps=T, num_learner_envs=L, num_slots=2,
            gamma=0.97, normalize_returns=False,
        )
    )
    carry2, _, _, _ = fn_off(learner, stacked, carry, seating)
    assert float(carry2.return_norm.count) == 0.0
