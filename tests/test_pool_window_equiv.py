"""Fused W-update pool windows must be numerically identical to W
sequential vs-pool train steps with the same fixed rotation — the window
(train.py make_pool_train_window, cfg.pool_rotation_interval) is purely
a dispatch optimization for the device math; only the host-side
win-rate/rating fold cadence coarsens (documented in docs/DESIGN.md)."""

import jax
import jax.numpy as jnp
import numpy as np

from burn_ppo_tpu.config import Config
from burn_ppo_tpu.envs import make_env
from burn_ppo_tpu.ppo.pool_rollout import PoolSeating
from burn_ppo_tpu.ppo.rollout import init_rollout_carry
from burn_ppo_tpu.ppo.update import PPOUpdateConfig, make_optimizer
from burn_ppo_tpu.train import (
    TrainState,
    build_network_for_env,
    extract_pool_records,
    make_pool_train_step,
    make_pool_train_window,
)

K = 3  # opponent slots


def build(cfg, num_players):
    env = make_env(cfg.env)
    if env.spec.variable_player_count:
        env = env.with_num_players(num_players)
    net = build_network_for_env(env, cfg)
    tx = make_optimizer(
        PPOUpdateConfig(
            max_grad_norm=cfg.max_grad_norm, adam_epsilon=cfg.adam_epsilon
        )
    )
    kp, kc, ku, ks = jax.random.split(jax.random.PRNGKey(11), 4)
    state = TrainState(
        params=net.init(kp),
        opt_state=tx.init(net.init(kp)),
        carry=init_rollout_carry(env, cfg.num_envs, kc),
        obs_norm=None,
        popart=None,
        update_key=ku,
    )
    L = cfg.num_envs - cfg.num_envs // 4
    seating = PoolSeating.create(
        cfg.num_envs, L, env.spec.num_players, num_slots=K, key=ks
    )
    opp = [net.init(jax.random.PRNGKey(100 + i)) for i in range(K)]
    opp_params = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *opp)
    return env, net, tx, state, seating, L, opp_params


def _schedules(w):
    lrs = jnp.asarray([1e-3 * (0.9 ** i) for i in range(w)], jnp.float32)
    ecs = jnp.asarray([0.01 + 0.002 * i for i in range(w)], jnp.float32)
    scs = jnp.zeros((w,), jnp.float32)
    return lrs, ecs, scs


def test_pool_window_equals_sequential_steps():
    cfg = Config(
        env="connect_four", num_envs=8, num_steps=8, total_steps=10**6,
        hidden_size=8, num_hidden=1, num_minibatches=2, num_epochs=2,
        seed=11, opponent_pool_fraction=0.25,
    )
    W = 3
    lrs, ecs, scs = _schedules(W)

    env, net, tx, state0, seating0, L, opp = build(cfg, 2)
    step = jax.jit(make_pool_train_step(net, env, cfg, tx, L, K))
    s, seat = state0, seating0
    seq_records = []
    seq_count = 0.0
    for i in range(W):
        s, seat, metrics, lstats, rec = step(
            s, seat, opp, None, lrs[i], ecs[i], scs[i]
        )
        seq_records.append(jax.device_get(rec))
        seq_count += float(lstats["count"])
    seq_metrics = {k: float(v) for k, v in metrics.items()}

    env, net, tx, state0, seating0, L, opp = build(cfg, 2)
    window = jax.jit(make_pool_train_window(net, env, cfg, tx, L, K))
    w_state, w_seat, w_metrics, w_stats, w_rec = window(
        state0, seating0, opp, None, lrs, ecs, scs
    )
    w_metrics = {k: float(v) for k, v in w_metrics.items()}

    # Final params / seating / rng bit-identical.
    for a, b in zip(
        jax.tree_util.tree_leaves(s.params),
        jax.tree_util.tree_leaves(w_state.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(
        np.asarray(seat.learner_seat), np.asarray(w_seat.learner_seat)
    )
    np.testing.assert_array_equal(
        np.asarray(seat.seat_opp), np.asarray(w_seat.seat_opp)
    )
    np.testing.assert_array_equal(
        np.asarray(s.update_key), np.asarray(w_state.update_key)
    )
    # Window reports the LAST update's metrics; learner stats accumulate.
    for k in ("policy_loss", "value_loss", "entropy", "approx_kl"):
        assert w_metrics[k] == seq_metrics[k], k
    assert float(w_stats["count"]) == seq_count

    # The device-compacted row buffer must equal host-side extraction
    # over the sequential per-step logs, in the same order.
    w_rec = jax.device_get(w_rec)
    rows_win = np.asarray(w_rec["rows"][: int(w_rec["count"])], np.int32)
    rows_seq = np.concatenate(
        [extract_pool_records(r, 2) for r in seq_records]
    )
    np.testing.assert_array_equal(rows_win, rows_seq)
    assert float(w_metrics["pool_record_overflow"]) == 0.0


def test_pool_window_w1_matches_single_step():
    """W=1 window == the reference per-update cadence exactly."""
    cfg = Config(
        env="connect_four", num_envs=8, num_steps=4, total_steps=10**6,
        hidden_size=8, num_hidden=1, num_minibatches=2, num_epochs=1,
        seed=11, opponent_pool_fraction=0.25,
    )
    env, net, tx, state0, seating0, L, opp = build(cfg, 2)
    step = jax.jit(make_pool_train_step(net, env, cfg, tx, L, K))
    s, seat, m, _, rec = step(
        s0 := state0, seating0, opp, None,
        jnp.float32(1e-3), jnp.float32(0.01), jnp.float32(0.0),
    )

    env, net, tx, state0, seating0, L, opp = build(cfg, 2)
    window = jax.jit(make_pool_train_window(net, env, cfg, tx, L, K))
    ws, wseat, wm, _, wrec = window(
        state0, seating0, opp, None,
        jnp.full((1,), 1e-3, jnp.float32),
        jnp.full((1,), 0.01, jnp.float32),
        jnp.zeros((1,), jnp.float32),
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(s.params),
        jax.tree_util.tree_leaves(ws.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    wrec = jax.device_get(wrec)
    rows_win = np.asarray(wrec["rows"][: int(wrec["count"])], np.int32)
    rows_seq = extract_pool_records(jax.device_get(rec), 2)
    np.testing.assert_array_equal(rows_win, rows_seq)
    assert float(m["policy_loss"]) == float(wm["policy_loss"])


def test_padded_slots_with_num_active_match_exact_k():
    """A window compiled with num_slots=K_pad (stacked axis padded with
    duplicate opponents) and the traced active count num_active=K must
    be BIT-IDENTICAL to the exact num_slots=K window: slot sampling
    bounds by num_active, so padded slots are never seated (this is what
    lets the pool grow to max_active with zero recompiles)."""
    cfg = Config(
        env="connect_four", num_envs=16, num_steps=8, total_steps=10**9,
        hidden_size=8, num_hidden=1, num_minibatches=2, num_epochs=1,
        seed=0, opponent_pool_fraction=0.25,
    )
    env, net, tx, state, seating, L, opp_params = build(cfg, 2)
    w = 2
    lrs, ecs, scs = _schedules(w)

    exact = jax.jit(make_pool_train_window(net, env, cfg, tx, L, K))
    s_a, seat_a, m_a, st_a, rec_a = exact(
        state, seating, opp_params, None, lrs, ecs, scs,
        jnp.asarray(K, jnp.int32),
    )

    K_pad = K + 3
    pad = jax.tree_util.tree_map(
        lambda x: jnp.concatenate(
            [x] + [x[:1]] * (K_pad - K), axis=0
        ),
        opp_params,
    )
    padded = jax.jit(make_pool_train_window(net, env, cfg, tx, L, K_pad))
    s_b, seat_b, m_b, st_b, rec_b = padded(
        state, seating, pad, None, lrs, ecs, scs,
        jnp.asarray(K, jnp.int32),
    )

    for la, lb in zip(
        jax.tree_util.tree_leaves(s_a.params),
        jax.tree_util.tree_leaves(s_b.params),
    ):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
    for k_ in m_a:
        np.testing.assert_allclose(
            np.asarray(m_a[k_]), np.asarray(m_b[k_]), rtol=0, atol=0,
            err_msg=k_,
        )
    na, nb = int(rec_a["count"]), int(rec_b["count"])
    assert na == nb
    rows_a = np.asarray(rec_a["rows"][:na])
    rows_b = np.asarray(rec_b["rows"][:nb])
    np.testing.assert_array_equal(rows_a, rows_b)
    # no padded slot ever seated
    P = env.spec.num_players
    if nb:
        assert rows_b[:, 1:P].max() < K
    assert int(jnp.max(seat_b.seat_opp)) < K
