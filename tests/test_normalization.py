"""Normalizer tests (reference src/normalization.rs tests)."""

import jax.numpy as jnp
import numpy as np
import pytest

from burn_ppo_tpu.ppo.normalization import (
    ObsNormState,
    PopArtState,
    ReturnNormState,
    obs_norm_apply,
    obs_norm_update,
    popart_denormalize,
    popart_normalize,
    popart_rescale_value_head,
    popart_update,
    return_norm_step,
)


def test_obs_norm_identity_before_two_samples():
    s = ObsNormState.create(3)
    x = jnp.array([[1.0, 2.0, 3.0]])
    np.testing.assert_array_equal(np.asarray(obs_norm_apply(s, x)), np.asarray(x))


def test_obs_norm_matches_batch_stats():
    rng = np.random.default_rng(0)
    data = rng.normal(loc=5.0, scale=3.0, size=(1000, 4)).astype(np.float32)
    s = ObsNormState.create(4)
    s = obs_norm_update(s, jnp.asarray(data))
    out = np.asarray(obs_norm_apply(s, jnp.asarray(data)))
    np.testing.assert_allclose(out.mean(axis=0), 0.0, atol=1e-3)
    np.testing.assert_allclose(out.std(axis=0), 1.0, atol=1e-2)


def test_obs_norm_incremental_merge_equals_single_batch():
    rng = np.random.default_rng(1)
    a = rng.normal(size=(100, 2)).astype(np.float32)
    b = rng.normal(loc=2.0, size=(50, 2)).astype(np.float32)
    s1 = obs_norm_update(obs_norm_update(ObsNormState.create(2), jnp.asarray(a)), jnp.asarray(b))
    s2 = obs_norm_update(ObsNormState.create(2), jnp.asarray(np.vstack([a, b])))
    np.testing.assert_allclose(np.asarray(s1.mean), np.asarray(s2.mean), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(s1.m2), np.asarray(s2.m2), rtol=1e-4)
    assert float(s1.count) == float(s2.count)


def test_obs_norm_clipping():
    s = ObsNormState.create(1)
    s = obs_norm_update(s, jnp.array([[0.0], [1.0], [0.5], [0.7]]))
    out = obs_norm_apply(s, jnp.array([[1000.0]]), clip=10.0)
    assert float(out[0, 0]) == 10.0


def test_return_norm_scales_by_return_std():
    s = ReturnNormState.create(2, 1)
    gamma = 0.99
    rewards_seq = [1.0, 1.0, 1.0, 1.0, 1.0]
    for r in rewards_seq:
        s, normed = return_norm_step(
            s,
            jnp.array([r, r]),
            jnp.zeros(2, jnp.int32),
            jnp.zeros(2, jnp.bool_),
            gamma,
        )
    # After several identical steps, normalized rewards are finite & scaled
    assert np.isfinite(float(normed[0]))
    assert float(s.count) == 10.0  # 2 envs x 5 steps


def test_return_norm_resets_on_done():
    s = ReturnNormState.create(1, 2)
    s, _ = return_norm_step(
        s,
        jnp.array([2.0]),
        jnp.array([1], jnp.int32),
        jnp.array([True]),
        0.9,
    )
    # acting player (1)'s rolling return reset on done; player 0 untouched
    assert float(s.returns[0, 1]) == 0.0


def test_return_norm_gamma_applied_per_player():
    s = ReturnNormState.create(1, 2)
    # Player 0 acts twice: rolling return = 1*0.9 + 1 = 1.9
    s, _ = return_norm_step(
        s, jnp.array([1.0]), jnp.array([0], jnp.int32), jnp.array([False]), 0.9
    )
    s, _ = return_norm_step(
        s, jnp.array([1.0]), jnp.array([0], jnp.int32), jnp.array([False]), 0.9
    )
    assert float(s.returns[0, 0]) == pytest.approx(1.9)
    assert float(s.returns[0, 1]) == 0.0


def test_popart_identity_until_initialized():
    s = PopArtState.create()
    x = jnp.array([5.0])
    np.testing.assert_array_equal(
        np.asarray(popart_normalize(s, x)), np.asarray(x)
    )
    assert float(s.std) == 1.0


def test_popart_normalize_denormalize_roundtrip():
    s = PopArtState.create()
    s, _, _ = popart_update(s, jnp.array([1.0, 2.0, 3.0, 4.0]))
    x = jnp.array([2.5, -1.0, 7.0])
    back = popart_denormalize(s, popart_normalize(s, x))
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), rtol=1e-5)


def test_popart_rescale_preserves_denormalized_output():
    # A value head producing normalized output v_n; after a stats shift +
    # head rescale, denormalize(new_stats, new_head(x)) == denormalize(old, old_head(x)).
    s = PopArtState.create()
    s, _, _ = popart_update(s, jnp.array([1.0, 2.0, 3.0]))
    kernel = jnp.array([[0.5], [1.5]])
    bias = jnp.array([0.2])
    x = jnp.array([[1.0, -2.0]])
    v_old = x @ kernel + bias
    out_old = popart_denormalize(s, v_old)

    s2, old_mean, old_std = popart_update(s, jnp.array([10.0, 20.0, 30.0]))
    k2, b2 = popart_rescale_value_head(
        kernel, bias, old_mean, old_std, s2.mean, s2.std, jnp.array(True)
    )
    out_new = popart_denormalize(s2, x @ k2 + b2)
    np.testing.assert_allclose(np.asarray(out_new), np.asarray(out_old), rtol=1e-4)
