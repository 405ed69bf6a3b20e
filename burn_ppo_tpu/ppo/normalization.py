"""Running normalizers as pure pytree states.

Three normalizers with behavioral parity to the reference
(src/normalization.rs):

  * ObsNormState     — per-dimension running mean/var (Welford), clip,
                       identity until 2 samples (normalization.rs:12-102).
                       Updated *lagged*: stats advance once per rollout
                       with the raw batch, normalization during the
                       rollout uses the previous stats.
  * ReturnNormState  — per-env-per-player rolling discounted returns;
                       rewards divided by sqrt(running var of returns),
                       variance-only, clipped (normalization.rs:115-260).
  * PopArtState      — scalar mean/std of value targets with value-head
                       rescaling (van Hasselt et al. 2016;
                       normalization.rs:275-366, head rescale
                       src/ppo.rs:1599-1653).

All updates use Chan's parallel Welford merge, which is mathematically
identical to the reference's sequential Welford over the same batch, but
runs as one fused reduction on device.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct


def _welford_merge(mean_a, m2_a, count_a, mean_b, m2_b, count_b):
    """Merge two Welford accumulators (Chan et al.)."""
    total = count_a + count_b
    safe_total = jnp.maximum(total, 1.0)
    delta = mean_b - mean_a
    mean = mean_a + delta * (count_b / safe_total)
    m2 = m2_a + m2_b + jnp.square(delta) * (count_a * count_b / safe_total)
    keep = count_b > 0
    return (
        jnp.where(keep, mean, mean_a),
        jnp.where(keep, m2, m2_a),
        jnp.where(keep, total, count_a),
    )


# ---------------------------------------------------------------------------
# Observation normalizer
# ---------------------------------------------------------------------------
class ObsNormState(struct.PyTreeNode):
    mean: jax.Array  # f64-as-f32[D]
    m2: jax.Array  # [D]
    count: jax.Array  # scalar

    @staticmethod
    def create(obs_dim: int) -> "ObsNormState":
        return ObsNormState(
            mean=jnp.zeros((obs_dim,), jnp.float32),
            m2=jnp.zeros((obs_dim,), jnp.float32),
            count=jnp.zeros((), jnp.float32),
        )


def obs_norm_update(state: ObsNormState, batch: jax.Array) -> ObsNormState:
    """Merge a raw obs batch [..., D] into the running stats."""
    flat = batch.reshape(-1, batch.shape[-1])
    n = jnp.asarray(flat.shape[0], jnp.float32)
    mean_b = jnp.mean(flat, axis=0)
    m2_b = jnp.sum(jnp.square(flat - mean_b), axis=0)
    mean, m2, count = _welford_merge(state.mean, state.m2, state.count, mean_b, m2_b, n)
    return ObsNormState(mean=mean, m2=m2, count=count)


def obs_norm_apply(state: ObsNormState, obs: jax.Array, clip: float = 10.0) -> jax.Array:
    """Normalize obs [..., D]; identity until count >= 2 (normalization.rs:178)."""
    var = state.m2 / jnp.maximum(state.count, 1.0)
    std = jnp.maximum(jnp.sqrt(var), 1e-8)
    normalized = jnp.clip((obs - state.mean) / std, -clip, clip)
    return jnp.where(state.count < 2.0, obs, normalized)


# ---------------------------------------------------------------------------
# Return (reward) normalizer
# ---------------------------------------------------------------------------
class ReturnNormState(struct.PyTreeNode):
    returns: jax.Array  # [E, P] rolling discounted returns per player
    mean: jax.Array  # scalar Welford mean of observed rolling returns
    m2: jax.Array  # scalar Welford M2
    count: jax.Array  # scalar

    @staticmethod
    def create(num_envs: int, num_players: int) -> "ReturnNormState":
        return ReturnNormState(
            returns=jnp.zeros((num_envs, num_players), jnp.float32),
            mean=jnp.zeros((), jnp.float32),
            m2=jnp.zeros((), jnp.float32),
            count=jnp.zeros((), jnp.float32),
        )


def return_norm_step(
    state: ReturnNormState,
    rewards: jax.Array,  # [E] acting player's raw rewards this step
    acting: jax.Array,  # [E] int player indices
    dones: jax.Array,  # [E] bool / float
    gamma: float,
    clip: float = 10.0,
    valid: Optional[jax.Array] = None,  # [E] learner-turn mask for stats
) -> Tuple[ReturnNormState, jax.Array]:
    """One vectorized step of the reference's per-step sequence
    (normalization.rs:163-215 + src/ppo.rs:390-408):

      update_return -> update_variance_stats (valid turns) -> normalize
      -> reset acting player's rolling return on done.

    Returns (new_state, normalized_rewards [E]).
    """
    E, P = state.returns.shape
    dones = dones.astype(jnp.bool_)
    if valid is None:
        valid = jnp.ones((E,), jnp.bool_)
    onehot = jax.nn.one_hot(acting, P, dtype=state.returns.dtype)

    # returns[e, acting] = returns[e, acting] * gamma + reward
    updated = state.returns * (1.0 - onehot) + (
        state.returns * gamma + rewards[:, None]
    ) * onehot

    # Welford merge of the acting-player rolling returns on valid turns.
    samples = jnp.sum(updated * onehot, axis=-1)  # [E]
    w = valid.astype(jnp.float32)
    n = jnp.sum(w)
    mean_b = jnp.sum(samples * w) / jnp.maximum(n, 1.0)
    m2_b = jnp.sum(jnp.square(samples - mean_b) * w)
    mean, m2, count = _welford_merge(state.mean, state.m2, state.count, mean_b, m2_b, n)

    # Normalize with post-update stats (variance-only, clipped).
    var = m2 / jnp.maximum(count, 1.0)
    std = jnp.sqrt(var + 1e-8)
    normalized = jnp.clip(rewards / std, -clip, clip)
    normalized = jnp.where(count < 2.0, rewards, normalized)

    # Reset the acting player's rolling return on done (after stats).
    updated = jnp.where(dones[:, None], updated * (1.0 - onehot), updated)

    return (
        ReturnNormState(returns=updated, mean=mean, m2=m2, count=count),
        normalized,
    )


# ---------------------------------------------------------------------------
# PopArt value normalizer
# ---------------------------------------------------------------------------
POPART_EPS = 1e-4


class PopArtState(struct.PyTreeNode):
    mean: jax.Array
    m2: jax.Array
    count: jax.Array

    @staticmethod
    def create() -> "PopArtState":
        return PopArtState(
            mean=jnp.zeros((), jnp.float32),
            m2=jnp.zeros((), jnp.float32),
            count=jnp.zeros((), jnp.float32),
        )

    @property
    def std(self) -> jax.Array:
        """1.0 before 2 samples (normalization.rs:313-320)."""
        s = jnp.sqrt(self.m2 / jnp.maximum(self.count, 1.0) + POPART_EPS)
        return jnp.where(self.count < 2.0, 1.0, s)

    @property
    def initialized(self) -> jax.Array:
        return self.count >= 2.0


def popart_update(
    state: PopArtState, returns: jax.Array, mask: Optional[jax.Array] = None
) -> Tuple[PopArtState, jax.Array, jax.Array]:
    """Merge a batch of raw returns; gives (new_state, old_mean, old_std)."""
    old_mean, old_std = state.mean, state.std
    flat = returns.reshape(-1)
    if mask is None:
        w = jnp.ones_like(flat)
    else:
        w = mask.reshape(-1).astype(flat.dtype)
    n = jnp.sum(w)
    mean_b = jnp.sum(flat * w) / jnp.maximum(n, 1.0)
    m2_b = jnp.sum(jnp.square(flat - mean_b) * w)
    mean, m2, count = _welford_merge(state.mean, state.m2, state.count, mean_b, m2_b, n)
    return PopArtState(mean=mean, m2=m2, count=count), old_mean, old_std


def popart_normalize(state: PopArtState, x: jax.Array) -> jax.Array:
    return jnp.where(state.initialized, (x - state.mean) / state.std, x)


def popart_denormalize(state: PopArtState, x: jax.Array) -> jax.Array:
    return jnp.where(state.initialized, x * state.std + state.mean, x)


def popart_rescale_value_head(
    kernel: jax.Array,
    bias: jax.Array,
    old_mean: jax.Array,
    old_std: jax.Array,
    new_mean: jax.Array,
    new_std: jax.Array,
    do_rescale: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """W' = W * s_old/s_new ; b' = (b*s_old + mu_old - mu_new)/s_new.

    Preserves denormalized outputs across a stats shift
    (reference src/ppo.rs:1599-1653). ``do_rescale`` gates the update so
    the head is untouched until the normalizer is initialized.
    """
    new_kernel = kernel * (old_std / new_std)
    new_bias = (bias * old_std + old_mean - new_mean) / new_std
    return (
        jnp.where(do_rescale, new_kernel, kernel),
        jnp.where(do_rescale, new_bias, bias),
    )
