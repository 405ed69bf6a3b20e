"""Cross-env invariant fuzzing: random legal play through every game
must never break the env contract the training stack relies on
(non-empty masks on live states, finite obs/rewards, valid placements
at termination, current_player in range, done-state no-ops).

The runtime guards (train.py:_guard_counts) catch mask/NaN violations
in production; this fuzzer drives each env directly so a rule bug is
pinned to the env, not discovered as a guard trip mid-training."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from burn_ppo_tpu.envs import make_env
from burn_ppo_tpu.envs.base import EpisodeAccumulator, autoreset_step

ENVS = [
    ("cartpole", None),
    ("connect_four", None),
    ("liars_dice", None),
    ("skull", 2),
    ("skull", 4),
    ("skull", 6),
]


def rollout_random(env, steps, seed, num_envs=16):
    """Vectorized random-legal-action rollout with auto-reset; returns
    stacked per-step arrays for invariant checks."""
    key = jax.random.PRNGKey(seed)
    key, k0 = jax.random.split(key)
    states = jax.vmap(env.reset)(jax.random.split(k0, num_envs))
    acc = jax.vmap(lambda _: EpisodeAccumulator.zero(env.spec.num_players))(
        jnp.arange(num_envs)
    )

    def body(carry, k):
        states, acc = carry
        mask = jax.vmap(env.action_mask)(states)
        obs = jax.vmap(env.obs)(states)
        players = jax.vmap(env.current_player)(states)
        logits = jnp.where(mask, 0.0, -1e9)
        actions = jax.random.categorical(k, logits, axis=-1).astype(jnp.int32)
        k2 = jax.random.split(k, num_envs + 1)
        states2, acc2, term, log = jax.vmap(
            lambda s, a, act, rk: autoreset_step(env, s, a, act, rk)
        )(states, acc, actions, k2[1:])
        out = {
            "mask_any": jnp.any(mask, axis=-1),
            "obs_finite": jnp.all(jnp.isfinite(obs), axis=-1),
            "players": players,
            "rewards": term.rewards,
            "done": term.done,
            "completed": log.completed,
            "outcome": log.outcome,
            "length": log.length,
        }
        return (states2, acc2), out

    (states, acc), outs = jax.lax.scan(
        body, (states, acc), jax.random.split(key, steps)
    )
    return jax.device_get(outs)


@pytest.mark.parametrize("name,players", ENVS)
def test_env_invariants_under_random_play(name, players):
    import zlib

    env = make_env(name)
    if players is not None:
        env = env.with_num_players(players)
    P = env.spec.num_players
    # Deterministic seed (hash() is per-process salted => flaky seeds);
    # high-player-count skull needs more random steps to finish a game.
    seed = zlib.crc32(name.encode()) % 1000 + (players or 0)
    steps = 512 if (name == "skull" and (players or 0) >= 5) else 160
    outs = rollout_random(env, steps=steps, seed=seed)

    # 1. A live (pre-step) state always offers at least one legal action.
    assert outs["mask_any"].all(), f"{name}: empty action mask on live state"
    # 2. Observations stay finite.
    assert outs["obs_finite"].all(), f"{name}: non-finite observation"
    # 3. The acting player is always a valid seat.
    assert (outs["players"] >= 0).all() and (outs["players"] < P).all()
    # 4. Rewards finite everywhere.
    assert np.isfinite(outs["rewards"]).all()

    completed = outs["completed"]
    assert completed.any(), f"{name}: no episode finished in {steps} steps"
    # 5. Placements at completion are a valid '1224' competition ranking:
    #    within 1..P, at least one winner, and consistent tie counts
    #    (place p is held by exactly (number of strictly-better players)+1).
    oc = outs["outcome"][completed]  # [n, P]
    assert (oc >= 1).all() and (oc <= P).all()
    assert (oc == 1).any(axis=-1).all(), f"{name}: game without a 1st place"
    better = (oc[:, None, :] < oc[:, :, None]).sum(-1)  # [n, P]
    np.testing.assert_array_equal(better + 1, oc)
    # 6. Episode lengths positive and bounded by cap when declared.
    lengths = outs["length"][completed]
    assert (lengths > 0).all()
    cap = env.spec.max_episode_steps
    if cap:
        assert (lengths <= cap).all()


@pytest.mark.parametrize("name,players", [("connect_four", None), ("skull", 3)])
def test_terminal_states_are_noops_until_reset(name, players):
    """Stepping a done state (without auto-reset) must not mutate the
    outcome — the interactive/eval paths rely on this."""
    env = make_env(name)
    if players is not None:
        env = env.with_num_players(players)
    key = jax.random.PRNGKey(0)
    state = env.reset(key)
    # Drive one episode to completion with random legal actions.
    for i in range(400):
        if bool(state.done):
            break
        mask = env.action_mask(state)
        logits = jnp.where(mask, 0.0, -1e9)
        a = jax.random.categorical(jax.random.fold_in(key, i), logits)
        state = env.step(state, a.astype(jnp.int32))
    assert bool(state.done), "episode never terminated"
    outcome = np.asarray(env.game_outcome(state))
    for a in range(env.spec.num_actions):
        after = env.step(state, jnp.asarray(a, jnp.int32))
        assert bool(after.done)
        np.testing.assert_array_equal(
            np.asarray(env.game_outcome(after)), outcome
        )
        assert float(jnp.sum(jnp.abs(after.rewards))) == 0.0
