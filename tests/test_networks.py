"""Network construction/forward tests (reference src/network tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from burn_ppo_tpu.models.network import ActorCriticNetwork


def test_mlp_shapes():
    net = ActorCriticNetwork("mlp", obs_dim=5, action_count=2, hidden_size=64, num_hidden=2)
    params = net.init(jax.random.PRNGKey(0))
    obs = jnp.zeros((7, 5))
    logits, values = net.forward(params, obs)
    assert logits.shape == (7, 2)
    assert values.shape == (7,)


def test_mlp_orthogonal_init_gains():
    net = ActorCriticNetwork("mlp", obs_dim=8, action_count=4, hidden_size=32, activation="relu")
    params = net.init(jax.random.PRNGKey(0))
    # Policy head has tiny weights (gain 0.01)
    assert float(jnp.abs(params["policy_head"]["kernel"]).max()) < 0.05
    # Hidden kernel is orthogonal * gain along its smaller dimension:
    # for a wide (8 -> 32) kernel, rows are orthonormal: W W^T = gain^2 I
    w = params["layers"][0]["kernel"]
    gram = np.asarray(w @ w.T)
    gain2 = 2.0  # sqrt(2)^2 for relu
    np.testing.assert_allclose(gram, gain2 * np.eye(gram.shape[0]), atol=1e-4)
    # Biases zero
    assert float(jnp.abs(params["layers"][0]["bias"]).max()) == 0.0


def test_mlp_split_networks():
    net = ActorCriticNetwork(
        "mlp", obs_dim=5, action_count=3, hidden_size=16, split_networks=True
    )
    params = net.init(jax.random.PRNGKey(1))
    assert "critic_layers" in params
    logits, values = net.forward(params, jnp.ones((2, 5)))
    assert logits.shape == (2, 3)
    assert values.shape == (2,)


def test_cnn_shapes():
    # Connect-Four-like: (6, 7, 2) spatial + 2 extra features = 86 dims
    net = ActorCriticNetwork(
        "cnn",
        obs_dim=86,
        action_count=7,
        obs_shape=(6, 7, 2),
        num_conv_layers=2,
        conv_channels=(8, 8),
        kernel_size=3,
        cnn_fc_hidden_size=32,
        cnn_num_fc_layers=1,
        activation="relu",
    )
    params = net.init(jax.random.PRNGKey(0))
    logits, values = net.forward(params, jnp.zeros((3, 86)))
    assert logits.shape == (3, 7)
    assert values.shape == (3,)


def test_cnn_split_networks():
    net = ActorCriticNetwork(
        "cnn",
        obs_dim=84,
        action_count=7,
        obs_shape=(6, 7, 2),
        split_networks=True,
        activation="relu",
    )
    params = net.init(jax.random.PRNGKey(0))
    assert "critic_conv_layers" in params
    logits, values = net.forward(params, jnp.zeros((2, 84)))
    assert logits.shape == (2, 7)


def test_ctde_shapes():
    net = ActorCriticNetwork(
        "ctde",
        obs_dim=10,
        action_count=5,
        hidden_size=32,
        privileged_obs_dim=6,
        critic_hidden_size=64,
        critic_num_hidden=3,
    )
    params = net.init(jax.random.PRNGKey(0))
    obs = jnp.ones((4, 10))
    priv = jnp.ones((4, 6))
    logits = net.forward_actor(params, obs)
    values = net.forward_critic(params, priv, obs)
    assert logits.shape == (4, 5)
    assert values.shape == (4,)
    # critic first layer consumes priv+obs concat
    assert params["critic_layers"][0]["kernel"].shape == (16, 64)


def test_ctde_forward_raises():
    net = ActorCriticNetwork(
        "ctde", obs_dim=4, action_count=2, privileged_obs_dim=3
    )
    params = net.init(jax.random.PRNGKey(0))
    with pytest.raises(ValueError):
        net.forward(params, jnp.ones((1, 4)))


def test_value_head_surgery():
    net = ActorCriticNetwork("mlp", obs_dim=4, action_count=2)
    params = net.init(jax.random.PRNGKey(0))
    k, b = net.get_value_head(params)
    params2 = net.with_value_head(params, k * 2.0, b + 1.0)
    k2, b2 = net.get_value_head(params2)
    np.testing.assert_allclose(np.asarray(k2), np.asarray(k) * 2.0)
    np.testing.assert_allclose(np.asarray(b2), np.asarray(b) + 1.0)
    # untouched tree is shared
    assert params2["layers"] is params["layers"]


def test_cnn_zero_conv_layers_rejected():
    """init must fail fast: with 0 convs, fc_in would be sized from
    conv_channels[0] while the forward flattens raw input channels —
    an opaque trace-time dot_general mismatch otherwise."""
    net = ActorCriticNetwork(
        "cnn", obs_dim=86, action_count=7, obs_shape=(6, 7, 2),
        num_conv_layers=0,
    )
    with pytest.raises(ValueError, match="num_conv_layers"):
        net.init(jax.random.PRNGKey(0))
