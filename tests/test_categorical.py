"""Categorical op tests (reference src/utils.rs tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from burn_ppo_tpu.ops.categorical import (
    apply_action_mask,
    entropy_categorical,
    log_prob_categorical,
    sample_categorical,
    sample_with_temperature,
)


def test_sample_distribution():
    # Heavily skewed logits -> samples concentrate on the right action.
    logits = jnp.tile(jnp.array([[0.0, 5.0, 0.0]]), (4096, 1))
    actions = sample_categorical(jax.random.PRNGKey(0), logits)
    frac = float(jnp.mean((actions == 1).astype(jnp.float32)))
    assert frac > 0.95


def test_sample_respects_mask():
    logits = jnp.zeros((512, 4))
    mask = jnp.tile(jnp.array([[True, False, True, False]]), (512, 1))
    masked = apply_action_mask(logits, mask)
    actions = sample_categorical(jax.random.PRNGKey(1), masked)
    assert set(np.unique(np.asarray(actions))) <= {0, 2}


def test_log_prob_uniform():
    logits = jnp.zeros((3, 4))
    actions = jnp.array([0, 1, 3], dtype=jnp.int32)
    lp = log_prob_categorical(logits, actions)
    np.testing.assert_allclose(np.asarray(lp), np.log(0.25), rtol=1e-5)


def test_entropy_uniform_is_log_n():
    logits = jnp.zeros((2, 8))
    h = entropy_categorical(logits)
    np.testing.assert_allclose(np.asarray(h), np.log(8.0), rtol=1e-5)


def test_entropy_deterministic_is_zero():
    logits = jnp.array([[100.0, 0.0, 0.0]])
    h = entropy_categorical(logits)
    assert float(h[0]) == pytest.approx(0.0, abs=1e-4)


def test_entropy_with_mask_no_nan():
    logits = jnp.zeros((2, 4))
    mask = jnp.array([[1.0, 1.0, 0.0, 0.0], [1.0, 0.0, 0.0, 0.0]])
    h = entropy_categorical(apply_action_mask(logits, mask))
    assert np.isfinite(np.asarray(h)).all()
    assert float(h[0]) == pytest.approx(np.log(2.0), abs=1e-4)
    assert float(h[1]) == pytest.approx(0.0, abs=1e-4)


def test_mask_none_passthrough():
    logits = jnp.ones((2, 3))
    out = apply_action_mask(logits, None)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(logits))


def test_temperature_zero_is_argmax():
    logits = jnp.array([[0.1, 3.0, 0.2], [5.0, 0.0, 0.0]])
    a = sample_with_temperature(jax.random.PRNGKey(0), logits, 0.0)
    np.testing.assert_array_equal(np.asarray(a), [1, 0])


def test_temperature_zero_tie_breaks_to_last_index():
    """Greedy ties resolve to the LAST maximal index, matching the
    reference's Iterator::max_by (eval.rs:242-246), which keeps the
    later of equal elements."""
    logits = jnp.array(
        [[2.0, 2.0, 0.1], [0.5, 1.0, 1.0], [3.0, 3.0, 3.0]]
    )
    a = sample_with_temperature(jax.random.PRNGKey(0), logits, 0.0)
    np.testing.assert_array_equal(np.asarray(a), [1, 2, 2])


def test_temperature_high_flattens():
    logits = jnp.tile(jnp.array([[0.0, 2.0]]), (8192, 1))
    a_low = sample_with_temperature(jax.random.PRNGKey(0), logits, 0.1)
    a_high = sample_with_temperature(jax.random.PRNGKey(0), logits, 10.0)
    frac_low = float(jnp.mean(a_low.astype(jnp.float32)))
    frac_high = float(jnp.mean(a_high.astype(jnp.float32)))
    assert frac_low > 0.99
    assert 0.4 < frac_high < 0.75


def test_log_prob_finite_with_inf_mask():
    """-inf masking (the common JAX idiom) must not poison the selection."""
    import numpy as np
    from burn_ppo_tpu.ops.categorical import log_prob_categorical

    logits = jnp.asarray([[1.0, -jnp.inf, 0.5]])
    lp = log_prob_categorical(logits, jnp.asarray([0]))
    assert np.isfinite(np.asarray(lp)).all()
