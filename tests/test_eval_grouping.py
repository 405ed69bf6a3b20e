"""Eval stats-engine model grouping/dedup (reference eval.rs:1685-1717:
envs are forwarded only by their acting model; here via stacked-param
contraction instead of CPU partitioning)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from burn_ppo_tpu.envs import make_env
from burn_ppo_tpu.eval import PlayerSource, make_acting_logits_fn, run_stats_mode
from burn_ppo_tpu.models.network import ActorCriticNetwork
from burn_ppo_tpu.ppo.normalization import ObsNormState, obs_norm_update


def _mlp_source(name, seed, obs_dim=7, actions=5, with_norm=False):
    net = ActorCriticNetwork(
        network_type="mlp", obs_dim=obs_dim, action_count=actions,
        hidden_size=8, num_hidden=1,
    )
    params = net.init(jax.random.PRNGKey(seed))
    obs_norm = None
    if with_norm:
        obs_norm = obs_norm_update(
            ObsNormState.create(obs_dim),
            jax.random.normal(jax.random.PRNGKey(seed + 50), (32, obs_dim))
            * (1.0 + seed),
        )
    return PlayerSource(
        kind="checkpoint", name=name, network=net, params=params,
        obs_norm=obs_norm,
    )


class _FakeEnv:
    class spec:
        num_actions = 5


def _reference_logits(sources, obs_raw, acting_source):
    """Straight per-source full-batch forwards + per-env pick."""
    from burn_ppo_tpu.ppo.normalization import obs_norm_apply

    E = obs_raw.shape[0]
    out = np.zeros((E, sources[0].network.action_count if sources[0].kind ==
                    "checkpoint" else 5), np.float32)
    outs = []
    for s in sources:
        if s.kind == "random":
            outs.append(np.zeros((E, 5), np.float32))
        else:
            o = obs_raw
            if s.obs_norm is not None:
                o = obs_norm_apply(s.obs_norm, o)
            outs.append(np.asarray(s.network.forward_actor(s.params, o)))
    for e in range(E):
        out[e] = outs[int(acting_source[e])][e]
    return out


@pytest.mark.parametrize("with_norm", [False, True])
def test_grouped_matches_per_source_forwards(with_norm):
    sources = [_mlp_source(f"m{i}", i, with_norm=with_norm) for i in range(3)]
    fn = make_acting_logits_fn(_FakeEnv(), sources, num_envs=16)
    obs = jax.random.normal(jax.random.PRNGKey(9), (16, 7))
    acting = jnp.asarray(np.arange(16) % 3, jnp.int32)
    got = np.asarray(fn(obs, acting))
    want = _reference_logits(sources, obs, np.asarray(acting))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_random_source_rows_are_zero_logits():
    sources = [_mlp_source("m0", 0), PlayerSource.random()]
    fn = make_acting_logits_fn(_FakeEnv(), sources, num_envs=8)
    obs = jax.random.normal(jax.random.PRNGKey(1), (8, 7))
    acting = jnp.asarray([0, 1] * 4, jnp.int32)
    got = np.asarray(fn(obs, acting))
    assert np.all(got[1::2] == 0.0)
    assert not np.all(got[0::2] == 0.0)


def test_duplicate_sources_dedup_to_one_forward(monkeypatch):
    """The same model referenced by N sources must forward once."""
    base = _mlp_source("m0", 0)
    dup = PlayerSource(
        kind="checkpoint", name="m0-again", network=base.network,
        params=base.params, obs_norm=base.obs_norm,
    )
    calls = {"n": 0}
    real = base.network.forward_actor

    class CountingNet:
        def __init__(self, net):
            self._net = net

        def __eq__(self, other):
            return True

        def forward_actor(self, params, obs):
            calls["n"] += 1
            return real(params, obs)

    counting = CountingNet(base.network)
    a = PlayerSource(kind="checkpoint", name="a", network=counting,
                     params=base.params, obs_norm=None)
    b = PlayerSource(kind="checkpoint", name="b", network=counting,
                     params=base.params, obs_norm=None)
    fn = make_acting_logits_fn(_FakeEnv(), [a, b], num_envs=4)
    obs = jnp.zeros((4, 7))
    fn(obs, jnp.asarray([0, 1, 0, 1], jnp.int32))
    assert calls["n"] == 1  # U == 1 -> single direct forward


def test_hetero_fallback_matches():
    """Different architectures -> per-unique-model forwards, same math."""
    s1 = _mlp_source("small", 0)
    net_big = ActorCriticNetwork(
        network_type="mlp", obs_dim=7, action_count=5,
        hidden_size=16, num_hidden=2,
    )
    s2 = PlayerSource(
        kind="checkpoint", name="big", network=net_big,
        params=net_big.init(jax.random.PRNGKey(4)), obs_norm=None,
    )
    sources = [s1, s2, PlayerSource.random()]
    fn = make_acting_logits_fn(_FakeEnv(), sources, num_envs=9)
    obs = jax.random.normal(jax.random.PRNGKey(2), (9, 7))
    acting = jnp.asarray(np.arange(9) % 3, jnp.int32)
    got = np.asarray(fn(obs, acting))
    want = _reference_logits(sources, obs, np.asarray(acting))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_stats_mode_end_to_end_with_grouping():
    """Full stats run on Connect Four with 2 distinct checkpoints-in-
    memory exercises the grouped path inside the jitted chunk scan."""
    env = make_env("connect_four")
    srcs = []
    for i in range(2):
        net = ActorCriticNetwork(
            network_type="mlp", obs_dim=env.spec.obs_dim,
            action_count=env.spec.num_actions, hidden_size=8, num_hidden=1,
        )
        srcs.append(
            PlayerSource(
                kind="checkpoint", name=f"p{i}", network=net,
                params=net.init(jax.random.PRNGKey(i)), obs_norm=None,
            )
        )
    stats = run_stats_mode(
        env, srcs, num_games=12, num_envs=8, seed=0, chunk_steps=16,
        quiet=True,
    )
    assert stats.total_games >= 12
    assert sum(stats.games) == 2 * stats.total_games  # both seats recorded
