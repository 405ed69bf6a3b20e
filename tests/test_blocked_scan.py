"""Direct tests for `blocked_scan` (ppo/rollout.py): bit-identity of
(carry, ys) vs plain `lax.scan` across block sizes and step counts,
including the non-multiple block-halving fallback, RNG-consumption
order, and the full self-play / vs-pool rollout paths under forced
block sizes.  Mirrors the reference's hand-vector discipline for every
hot-path transform (src/ppo.rs:2146-2736)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import burn_ppo_tpu.ppo.rollout as rollout_mod
from burn_ppo_tpu.envs import make_env
from burn_ppo_tpu.models.network import make_network
from burn_ppo_tpu.ppo.pool_rollout import (
    PoolSeating,
    collect_rollouts_with_opponents,
)
from burn_ppo_tpu.ppo.rollout import (
    blocked_scan,
    collect_rollouts,
    default_scan_block,
    init_rollout_carry,
)

E, C = 4, 6  # env count / channel width for the synthetic step


def synthetic_step(carry, _):
    """A step that exercises what the rollout step does: RNG splits,
    mixed-dtype multi-leaf ys, and nonlinear carry updates."""
    key, acc = carry
    key, k1, k2 = jax.random.split(key, 3)
    noise = jax.random.normal(k1, (E, C))
    draw = jax.random.randint(k2, (E,), 0, 7)
    new_acc = acc * 0.9 + jnp.sum(noise, axis=1)
    ys = {
        "row": noise + acc[:, None],
        "idx": draw.astype(jnp.int32),
        "flag": (new_acc > 0.0),
        "scalar": jnp.sum(new_acc),
    }
    return (key, new_acc), ys


def init_carry():
    return (jax.random.PRNGKey(42), jnp.linspace(-1.0, 1.0, E))


def assert_trees_bitwise_equal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        x, y = np.asarray(x), np.asarray(y)
        assert x.dtype == y.dtype and x.shape == y.shape
        np.testing.assert_array_equal(x, y)


def assert_trees_equiv(a, b, rtol=1e-4, atol=1e-5):
    """Exact for int/bool leaves; ~1-ulp tolerant for floats — XLA may
    contract mul+add chains spanning the unrolled steps into FMAs with
    different rounding (rollout.py blocked_scan docstring)."""
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        x, y = np.asarray(x), np.asarray(y)
        assert x.dtype == y.dtype and x.shape == y.shape
        if np.issubdtype(x.dtype, np.floating):
            np.testing.assert_allclose(x, y, rtol=rtol, atol=atol)
        else:
            np.testing.assert_array_equal(x, y)


@pytest.mark.parametrize("num_steps", [1, 4, 6, 8, 24])
@pytest.mark.parametrize("block", [1, 2, 4, 8])
def test_bit_identical_to_lax_scan(num_steps, block):
    ref_c, ref_ys = jax.jit(
        lambda c: jax.lax.scan(synthetic_step, c, None, length=num_steps)
    )(init_carry())
    got_c, got_ys = jax.jit(
        lambda c: blocked_scan(synthetic_step, c, num_steps, block=block)
    )(init_carry())
    assert_trees_bitwise_equal(ref_c, got_c)
    assert_trees_bitwise_equal(ref_ys, got_ys)


@pytest.mark.parametrize("num_steps,block", [(6, 8), (6, 4), (10, 8), (5, 8)])
def test_block_halving_fallback(num_steps, block):
    """num_steps not a multiple of block halves the block until it
    divides (rollout.py); odd counts fall all the way to block=1."""
    ref = jax.lax.scan(synthetic_step, init_carry(), None, length=num_steps)
    got = blocked_scan(synthetic_step, init_carry(), num_steps, block=block)
    assert_trees_bitwise_equal(ref, got)


def test_rng_consumption_order_preserved():
    """The blocked form must consume the carry RNG in exactly the same
    order as the sequential scan — each step's ys row must equal the
    value the plain scan produced AT THAT STEP INDEX."""
    num_steps = 16
    _, ref_ys = jax.lax.scan(
        synthetic_step, init_carry(), None, length=num_steps
    )
    _, got_ys = blocked_scan(
        synthetic_step, init_carry(), num_steps, block=8
    )
    for t in range(num_steps):
        np.testing.assert_array_equal(
            np.asarray(ref_ys["idx"][t]), np.asarray(got_ys["idx"][t])
        )
        np.testing.assert_array_equal(
            np.asarray(ref_ys["row"][t]), np.asarray(got_ys["row"][t])
        )


def test_default_block_is_platform_gated():
    """On the CPU test backend the default must be 1 (plain lax.scan):
    the 8x unroll is a TPU tiling optimization and costs XLA:CPU a ~20x
    compile blowup (VERDICT r4: the red multichip dryrun)."""
    assert jax.default_backend() == "cpu"
    assert default_scan_block() == 1
    assert default_scan_block(400) == 1  # platform gate beats width


def test_default_block_env_override(monkeypatch):
    monkeypatch.setenv("BURN_PPO_SCAN_BLOCK", "4")
    assert default_scan_block() == 4
    assert default_scan_block(8) == 4


def test_rollout_row_width():
    """Width drives the TPU wide-vs-narrow block choice: cartpole must
    classify narrow (<32: block 1 on TPU), skull-CTDE wide (>=32)."""
    from burn_ppo_tpu.ppo.rollout import rollout_row_width

    cart = make_env("cartpole")
    assert rollout_row_width(cart, True, False) < 32
    c4 = make_env("connect_four")
    assert rollout_row_width(c4, True, False) >= 32
    skull = make_env("skull").with_num_players(4)
    assert rollout_row_width(skull, True, True) >= 300


@pytest.mark.parametrize("forced_block", [2, 8])
def test_selfplay_rollout_bit_identical_across_blocks(
    monkeypatch, forced_block
):
    """Full collect_rollouts must produce equivalent (carry, batch,
    logs) whether the scan is blocked or not: exact for int/bool,
    ~1-ulp for floats (FMA-contraction freedom across unrolled steps)."""
    env = make_env("cartpole")
    net = make_network(env.spec, network_type="mlp", hidden_size=16,
                       num_hidden=1, activation="tanh")
    params = net.init(jax.random.PRNGKey(0))
    carry0 = init_rollout_carry(env, 8, jax.random.PRNGKey(1))

    def run():
        return jax.jit(
            lambda p, c: collect_rollouts(
                net, env, p, c, None, None, num_steps=16, gamma=0.99,
                normalize_returns=True,
            )
        )(params, carry0)

    monkeypatch.setattr(rollout_mod, "default_scan_block", lambda *_: 1)
    ref = jax.device_get(run())
    monkeypatch.setattr(
        rollout_mod, "default_scan_block", lambda *_: forced_block
    )
    got = jax.device_get(run())
    assert_trees_equiv(ref, got)


def test_pool_rollout_bit_identical_across_blocks(monkeypatch):
    """The vs-pool path (stacked opponents, reseat-on-done) goes through
    the same blocked_scan; verify block=8 vs block=1 equivalence."""
    env = make_env("connect_four")
    net = make_network(env.spec, network_type="mlp", hidden_size=8,
                       num_hidden=1, activation="tanh")
    params = net.init(jax.random.PRNGKey(0))
    K, num_envs, L = 3, 8, 6
    opp = [net.init(jax.random.PRNGKey(100 + i)) for i in range(K)]
    opp_params = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *opp)
    carry0 = init_rollout_carry(env, num_envs, jax.random.PRNGKey(1))
    seating0 = PoolSeating.create(
        num_envs, L, env.spec.num_players, num_slots=K,
        key=jax.random.PRNGKey(2),
    )

    def run():
        return jax.jit(
            lambda p, o, c, s: collect_rollouts_with_opponents(
                net, env, p, o, None, c, s, None, None,
                num_steps=16, num_learner_envs=L, num_slots=K,
                gamma=0.99, normalize_returns=True,
            )
        )(params, opp_params, carry0, seating0)

    monkeypatch.setattr(rollout_mod, "default_scan_block", lambda *_: 1)
    ref = jax.device_get(run())
    monkeypatch.setattr(rollout_mod, "default_scan_block", lambda *_: 8)
    got = jax.device_get(run())
    assert_trees_equiv(ref, got)
