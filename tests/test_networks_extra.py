"""Extended network tests: init statistics, activation variants, CNN
layer geometry, CTDE independence, dtype paths."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from burn_ppo_tpu.envs import make_env
from burn_ppo_tpu.models.network import ActorCriticNetwork, make_network


def mlp(**kw):
    d = dict(network_type="mlp", obs_dim=10, action_count=4,
             hidden_size=32, num_hidden=2, activation="tanh")
    d.update(kw)
    return ActorCriticNetwork(**d)


# ------------------------------------------------------- init statistics
def test_orthogonal_kernels_are_orthogonal():
    net = mlp(hidden_size=32)
    p = net.init(jax.random.PRNGKey(0))
    k = np.asarray(p["layers"][1]["kernel"])  # square 32x32
    prod = k.T @ k
    # orthogonal * gain sqrt(2)? tanh nets use gain... check scaled identity
    diag = np.diag(prod)
    off = prod - np.diag(diag)
    assert np.allclose(diag, diag[0], atol=1e-4)
    assert np.abs(off).max() < 1e-4


def test_policy_head_small_gain():
    """Policy head gain 0.01, value head gain 1.0 (mlp.rs:16-38)."""
    net = mlp()
    p = net.init(jax.random.PRNGKey(1))
    pol = np.asarray(p["policy_head"]["kernel"])
    val = np.asarray(p["value_head"]["kernel"])
    assert np.abs(pol).max() < 0.02
    assert np.abs(val).max() > 0.05


def test_biases_zero_initialized():
    net = mlp()
    p = net.init(jax.random.PRNGKey(2))
    for layer in p["layers"]:
        assert np.all(np.asarray(layer["bias"]) == 0.0)
    assert np.all(np.asarray(p["policy_head"]["bias"]) == 0.0)
    assert np.all(np.asarray(p["value_head"]["bias"]) == 0.0)


def test_relu_vs_tanh_differ():
    obs = jax.random.normal(jax.random.PRNGKey(3), (8, 10))
    net_t = mlp(activation="tanh")
    net_r = mlp(activation="relu")
    p = net_t.init(jax.random.PRNGKey(4))
    lt, _ = net_t.forward(p, obs)
    lr_, _ = net_r.forward(p, obs)
    assert not np.allclose(np.asarray(lt), np.asarray(lr_))


def test_deterministic_init():
    net = mlp()
    p1 = net.init(jax.random.PRNGKey(7))
    p2 = net.init(jax.random.PRNGKey(7))
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# ------------------------------------------------------- forward behavior
def test_batch_independence():
    """Row i's outputs don't depend on other rows."""
    net = mlp()
    p = net.init(jax.random.PRNGKey(0))
    obs = jax.random.normal(jax.random.PRNGKey(1), (4, 10))
    logits_full, v_full = net.forward(p, obs)
    logits_one, v_one = net.forward(p, obs[1:2])
    np.testing.assert_allclose(
        np.asarray(logits_full[1]), np.asarray(logits_one[0]), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(v_full[1]), np.asarray(v_one[0]), atol=1e-6
    )


def test_policy_and_value_matches_forward():
    net = mlp()
    p = net.init(jax.random.PRNGKey(0))
    obs = jax.random.normal(jax.random.PRNGKey(1), (4, 10))
    l1, v1 = net.forward(p, obs)
    l2, v2 = net.policy_and_value(p, obs, None)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2))
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2))


def test_split_networks_independent_params():
    net = mlp(split_networks=True)
    p = net.init(jax.random.PRNGKey(0))
    # critic trunk exists separately; perturbing it must not move logits
    obs = jax.random.normal(jax.random.PRNGKey(1), (4, 10))
    l_before, v_before = net.forward(p, obs)
    p2 = jax.tree_util.tree_map(lambda x: x, p)
    p2["critic_layers"][0]["kernel"] = p2["critic_layers"][0]["kernel"] + 1.0
    l_after, v_after = net.forward(p2, obs)
    np.testing.assert_allclose(np.asarray(l_before), np.asarray(l_after))
    assert not np.allclose(np.asarray(v_before), np.asarray(v_after))


# ------------------------------------------------------- CNN
def test_cnn_translation_sensitivity_and_shape():
    env = make_env("connect_four")
    net = make_network(env.spec, network_type="cnn", hidden_size=32,
                       num_hidden=1, activation="relu",
                       num_conv_layers=2, conv_channels=[8, 8],
                       kernel_size=3, cnn_fc_hidden_size=32,
                       cnn_num_fc_layers=1)
    p = net.init(jax.random.PRNGKey(0))
    obs = jnp.zeros((2, env.spec.obs_dim))
    # piece at two different board positions -> different logits
    obs = obs.at[0, 0].set(1.0).at[1, 20].set(1.0)
    logits, values = net.forward(p, obs)
    assert logits.shape == (2, 7)
    assert not np.allclose(np.asarray(logits[0]), np.asarray(logits[1]))


def test_cnn_extra_features_used():
    """The 2 turn-indicator floats beyond the spatial slice affect output."""
    env = make_env("connect_four")
    net = make_network(env.spec, network_type="cnn", hidden_size=32,
                       num_hidden=1, activation="relu")
    p = net.init(jax.random.PRNGKey(0))
    a = jnp.zeros((1, env.spec.obs_dim)).at[0, 84].set(1.0)
    b = jnp.zeros((1, env.spec.obs_dim)).at[0, 85].set(1.0)
    la, _ = net.forward(p, a)
    lb, _ = net.forward(p, b)
    assert not np.allclose(np.asarray(la), np.asarray(lb))


# ------------------------------------------------------- CTDE
def test_ctde_critic_uses_privileged_only_path():
    env = make_env("liars_dice")
    net = make_network(env.spec, network_type="ctde", hidden_size=64,
                       num_hidden=1, activation="relu",
                       critic_hidden_size=64, critic_num_hidden=1)
    p = net.init(jax.random.PRNGKey(0))
    obs = jax.random.normal(jax.random.PRNGKey(1), (3, env.spec.obs_dim))
    priv = jax.random.normal(jax.random.PRNGKey(2), (3, 120))
    v1 = net.forward_critic(p, priv, obs)
    v2 = net.forward_critic(p, priv + 1.0, obs)
    assert not np.allclose(np.asarray(v1), np.asarray(v2))
    # actor ignores privileged obs entirely
    a1 = net.forward_actor(p, obs)
    assert a1.shape == (3, env.spec.num_actions)


def test_ctde_custom_critic_dims():
    env = make_env("liars_dice")
    net = make_network(env.spec, network_type="ctde", hidden_size=64,
                       num_hidden=1, activation="relu",
                       critic_hidden_size=512, critic_num_hidden=3)
    p = net.init(jax.random.PRNGKey(0))
    assert p["critic_layers"][0]["kernel"].shape[1] == 512
    assert len(p["critic_layers"]) == 3


def test_bfloat16_compute_outputs_f32():
    net = mlp(compute_dtype="bfloat16")
    p = net.init(jax.random.PRNGKey(0))
    obs = jax.random.normal(jax.random.PRNGKey(1), (4, 10))
    logits, values = net.forward(p, obs)
    # params stay f32; compute casts internally
    assert p["layers"][0]["kernel"].dtype == jnp.float32
    assert np.isfinite(np.asarray(logits)).all()


def test_value_head_surgery_roundtrip():
    net = mlp()
    p = net.init(jax.random.PRNGKey(0))
    k, b = net.get_value_head(p)
    p2 = net.with_value_head(p, k * 2.0, b + 1.0)
    k2, b2 = net.get_value_head(p2)
    np.testing.assert_allclose(np.asarray(k2), np.asarray(k) * 2.0)
    np.testing.assert_allclose(np.asarray(b2), np.asarray(b) + 1.0)
    # other params untouched
    np.testing.assert_array_equal(
        np.asarray(p2["layers"][0]["kernel"]), np.asarray(p["layers"][0]["kernel"])
    )
