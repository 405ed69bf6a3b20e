"""Generalized Advantage Estimation as reverse `lax.scan`s.

The reference implements GAE with host-side Python-style loops over
(step, env) after pulling tensors to CPU (src/ppo.rs:1069-1264).  Here the
whole thing is a single on-device reverse scan over time with all envs
(and players) vectorized — it runs inside the jitted train step, so the
rollout never leaves HBM.

Two variants with exact behavioral parity:

  * ``compute_gae`` — single-player GAE(gamma, lambda)
    (reference src/ppo.rs:1069-1124).
  * ``compute_gae_multiplayer`` — turn-based multi-player GAE
    (reference src/ppo.rs:1140-1264): a reward-attribution carry credits
    rewards earned on other players' turns to the acting player's previous
    action, and per-player GAE chains bootstrap from each player's own
    last value. The reference runs two backward passes; both fold into one
    scan here because the second pass only consumes the first pass's
    output at the same timestep.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def compute_gae(
    rewards: jax.Array,  # [T, E] acting-player (possibly normalized) rewards
    values: jax.Array,  # [T, E] value predictions V(s_t)
    dones: jax.Array,  # [T, E] float 1.0 where episode terminated at t
    last_values: jax.Array,  # [E] bootstrap V(s_T)
    gamma: float,
    gae_lambda: float,
) -> Tuple[jax.Array, jax.Array]:
    """Single-player GAE. Returns (advantages [T,E], returns [T,E])."""
    dones = dones.astype(values.dtype)

    def body(carry, xs):
        next_value, last_gae = carry
        reward, value, done = xs
        not_done = 1.0 - done
        delta = reward + gamma * next_value * not_done - value
        last_gae = delta + gamma * gae_lambda * not_done * last_gae
        return (value, last_gae), last_gae

    init = (last_values, jnp.zeros_like(last_values))
    _, advantages = jax.lax.scan(
        body, init, (rewards, values, dones), reverse=True
    )
    return advantages, advantages + values


def compute_gae_multiplayer(
    all_rewards: jax.Array,  # [T, E, P] per-player rewards each step
    values: jax.Array,  # [T, E] acting player's value at each step
    dones: jax.Array,  # [T, E] float
    acting_players: jax.Array,  # [T, E] int, who acted at step t
    last_value_per_player: jax.Array,  # [E, P] per-player bootstrap values
    gamma: float,
    gae_lambda: float,
) -> Tuple[jax.Array, jax.Array]:
    """Multi-player GAE with reward attribution.

    Semantics (reference src/ppo.rs:1140-1264), walking backward in time:

    Reward attribution: rewards a player receives on *other* players'
    turns accumulate in a carry and are credited the next time (going
    backward: the previous time) that player acts. The carry resets at
    episode boundaries (done flags) *before* processing the terminal step,
    so credit never bleeds across episodes.

    Per-player GAE chains: each player's TD errors chain through their own
    actions only. On a done step, the GAE carry resets for everyone and
    ``next_value`` resets for non-acting players (the acting player's slot
    is immediately overwritten by their terminal-step value anyway).

    Returns (advantages [T,E], returns = advantages + values).
    """
    T, E, P = all_rewards.shape
    dones = dones.astype(values.dtype)

    def body(carry, xs):
        reward_carry, gae_carry, next_value = carry  # each [E, P]
        all_r, value, done, acting = xs  # [E,P], [E], [E], [E]
        onehot = jax.nn.one_hot(acting, P, dtype=all_r.dtype)  # [E, P]
        done_col = done[:, None]  # [E, 1]

        # --- Pass 1: attribute rewards to the acting player -------------
        # Reset carry BEFORE processing: clears rewards from (temporally
        # later, already-processed) future episodes.
        reward_carry = reward_carry * (1.0 - done_col)
        acting_reward = jnp.sum(all_r * onehot, axis=-1)  # [E]
        carried = jnp.sum(reward_carry * onehot, axis=-1)  # [E]
        attributed = acting_reward + carried
        # Acting player's carry is consumed; others accumulate this step's
        # rewards to be credited at their previous action.
        reward_carry = reward_carry * (1.0 - onehot) + all_r * (1.0 - onehot)

        # --- Pass 2: per-player GAE chains -------------------------------
        gae_carry = gae_carry * (1.0 - done_col)
        # On done: keep acting player's next_value slot, zero the others.
        next_value = jnp.where(
            done_col > 0.5, next_value * onehot, next_value
        )

        nv_acting = jnp.sum(next_value * onehot, axis=-1)  # [E]
        gae_acting = jnp.sum(gae_carry * onehot, axis=-1)  # [E]
        not_done = 1.0 - done
        delta = attributed + gamma * nv_acting * not_done - value
        advantage = delta + gamma * gae_lambda * not_done * gae_acting

        gae_carry = gae_carry * (1.0 - onehot) + advantage[:, None] * onehot
        next_value = next_value * (1.0 - onehot) + value[:, None] * onehot
        return (reward_carry, gae_carry, next_value), advantage

    init = (
        jnp.zeros((E, P), dtype=values.dtype),
        jnp.zeros((E, P), dtype=values.dtype),
        last_value_per_player.astype(values.dtype),
    )
    _, advantages = jax.lax.scan(
        body, init, (all_rewards, values, dones, acting_players), reverse=True
    )
    return advantages, advantages + values


def compute_explained_variance(
    values: jax.Array, returns: jax.Array, mask: jax.Array | None = None
) -> jax.Array:
    """1 - Var(returns - values) / Var(returns) over (optionally masked) samples.

    Reference src/ppo.rs:1268-1290. Returns 0 when Var(returns) is ~0.
    """
    if mask is None:
        mask = jnp.ones_like(returns)
    mask = mask.astype(returns.dtype)
    n = jnp.maximum(jnp.sum(mask), 1.0)

    def masked_var(x):
        mean = jnp.sum(x * mask) / n
        return jnp.sum(jnp.square(x - mean) * mask) / n

    var_ret = masked_var(returns)
    var_err = masked_var(returns - values)
    # Zero-variance cutoff 1e-8 matches the reference (ppo.rs:1281):
    # near-constant returns report EV=0, not a huge garbage ratio.
    return jnp.where(var_ret < 1e-8, 0.0, 1.0 - var_err / jnp.maximum(var_ret, 1e-8))
