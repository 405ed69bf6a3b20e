"""Fused K-update windows must be numerically identical to K sequential
unfused train steps (same schedules, same state) — the window is purely
a dispatch optimization (train.py make_train_window)."""

import jax
import jax.numpy as jnp
import numpy as np

from burn_ppo_tpu.config import Config
from burn_ppo_tpu.envs import make_env
from burn_ppo_tpu.ppo.normalization import ObsNormState
from burn_ppo_tpu.ppo.rollout import init_rollout_carry
from burn_ppo_tpu.ppo.update import PPOUpdateConfig, make_optimizer
from burn_ppo_tpu.train import (
    TrainState,
    build_network_for_env,
    make_train_step,
    make_train_window,
)


def build(cfg):
    env = make_env(cfg.env)
    net = build_network_for_env(env, cfg)
    tx = make_optimizer(
        PPOUpdateConfig(
            max_grad_norm=cfg.max_grad_norm, adam_epsilon=cfg.adam_epsilon
        )
    )
    key = jax.random.PRNGKey(7)
    kp, kc, ku = jax.random.split(key, 3)
    state = TrainState(
        params=net.init(kp),
        opt_state=tx.init(net.init(kp)),
        carry=init_rollout_carry(env, cfg.num_envs, kc),
        obs_norm=ObsNormState.create(env.spec.obs_dim)
        if cfg.normalize_obs
        else None,
        popart=None,
        update_key=ku,
    )
    return env, net, tx, state


def test_window_equals_sequential_steps():
    cfg = Config(
        env="cartpole", num_envs=4, num_steps=8, total_steps=10**6,
        hidden_size=8, num_hidden=1, num_minibatches=2, num_epochs=2,
        normalize_obs=True, seed=7, opponent_pool_fraction=0.0,
    )
    K = 4
    lrs = np.asarray([1e-3, 9e-4, 8e-4, 7e-4], np.float32)
    ecs = np.asarray([0.01, 0.012, 0.014, 0.016], np.float32)
    scs = np.zeros(K, np.float32)

    env, net, tx, state0 = build(cfg)

    step = jax.jit(make_train_step(net, env, cfg, tx, compact_stats=True))
    seq_state = state0
    seq_stats_sum = 0.0
    seq_kls, seq_clips = [], []
    for i in range(K):
        seq_state, metrics, stats = step(
            seq_state,
            jnp.asarray(lrs[i]),
            jnp.asarray(ecs[i]),
            jnp.asarray(scs[i]),
        )
        seq_stats_sum += float(stats["count"])
        seq_kls.append(float(metrics["approx_kl"]))
        seq_clips.append(float(metrics["clip_fraction"]))
    seq_metrics = {k: float(v) for k, v in metrics.items()}

    env, net, tx, state0 = build(cfg)  # fresh identical state
    window = jax.jit(make_train_window(net, env, cfg, tx))
    win_state, win_metrics, win_stats = window(
        state0, jnp.asarray(lrs), jnp.asarray(ecs), jnp.asarray(scs)
    )
    win_metrics = {k: float(v) for k, v in win_metrics.items()}

    # Final params bit-identical (same ops, same keys, same order).
    for a, b in zip(
        jax.tree_util.tree_leaves(seq_state.params),
        jax.tree_util.tree_leaves(win_state.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # Window reports the LAST update's metrics.
    for k in ("policy_loss", "value_loss", "entropy", "approx_kl"):
        assert win_metrics[k] == seq_metrics[k], k
    # Episode counts accumulate over the window.
    assert float(win_stats["count"]) == seq_stats_sum
    # Guard counters sum over the window (not last-update-only).
    assert win_metrics["nonfinite_count"] == 0.0
    # Window-max series equal the max over the K sequential updates —
    # a mid-window spike must not be masked by the last-update report.
    np.testing.assert_allclose(
        win_metrics["approx_kl_max"], max(seq_kls), rtol=1e-6
    )
    np.testing.assert_allclose(
        win_metrics["clip_fraction_max"], max(seq_clips), rtol=1e-6
    )


def test_aggregate_window_surfaces_mid_window_spike():
    """A synthetic one-update KL blow-up inside a window must surface in
    approx_kl_max even though the boundary metric is the last update's."""
    from burn_ppo_tpu.train import _aggregate_window

    metrics_all = {
        "approx_kl": jnp.asarray([0.01, 7.5, 0.02], jnp.float32),
        "clip_fraction": jnp.asarray([0.1, 0.9, 0.05], jnp.float32),
    }
    stats_all = {
        "count": jnp.zeros(3),
        "ret_sum": jnp.zeros((3, 1)),
        "ret0_max": jnp.zeros(3),
        "ret0_min": jnp.zeros(3),
        "len_sum": jnp.zeros(3),
        "pts_sum": jnp.zeros((3, 1)),
        "draws": jnp.zeros(3),
    }
    m, _ = _aggregate_window(metrics_all, stats_all)
    assert float(m["approx_kl"]) == float(np.float32(0.02))
    assert float(m["approx_kl_max"]) == 7.5
    assert float(m["clip_fraction_max"]) == float(np.float32(0.9))


def test_window_rng_chain_matches_sequential():
    """The update_key chain advances identically through the scan."""
    cfg = Config(
        env="cartpole", num_envs=2, num_steps=4, total_steps=10**6,
        hidden_size=8, num_hidden=1, num_minibatches=2, seed=7,
        opponent_pool_fraction=0.0,
    )
    env, net, tx, state0 = build(cfg)
    step = jax.jit(make_train_step(net, env, cfg, tx, compact_stats=True))
    s = state0
    for _ in range(2):
        s, _, _ = step(
            s, jnp.float32(1e-3), jnp.float32(0.01), jnp.float32(0.0)
        )
    env, net, tx, state0 = build(cfg)
    window = jax.jit(make_train_window(net, env, cfg, tx))
    w, _, _ = window(
        state0,
        jnp.full((2,), 1e-3, jnp.float32),
        jnp.full((2,), 0.01, jnp.float32),
        jnp.zeros((2,), jnp.float32),
    )
    np.testing.assert_array_equal(
        np.asarray(s.update_key), np.asarray(w.update_key)
    )
    np.testing.assert_array_equal(
        np.asarray(s.carry.key), np.asarray(w.carry.key)
    )
