"""Extended normalizer tests (reference normalization.rs has 28)."""

import jax
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


# ------------------------------------------------------- obs normalizer
def test_obs_norm_welford_matches_numpy_two_batches():
    rng = np.random.default_rng(0)
    b1 = rng.normal(2.0, 3.0, size=(64, 4)).astype(np.float32)
    b2 = rng.normal(-1.0, 0.5, size=(32, 4)).astype(np.float32)
    st = obs_norm_update(ObsNormState.create(4), jnp.asarray(b1))
    st = obs_norm_update(st, jnp.asarray(b2))
    allb = np.concatenate([b1, b2])
    np.testing.assert_allclose(np.asarray(st.mean), allb.mean(0), rtol=1e-4)
    var = np.asarray(st.m2) / float(st.count)
    np.testing.assert_allclose(var, allb.var(0), rtol=1e-3, atol=1e-4)


def test_obs_norm_update_accepts_3d_batches():
    st = obs_norm_update(
        ObsNormState.create(3), jnp.ones((5, 7, 3)) * 2.0
    )
    assert float(st.count) == 35.0
    np.testing.assert_allclose(np.asarray(st.mean), [2.0, 2.0, 2.0], atol=1e-6)


def test_obs_norm_apply_standardizes():
    rng = np.random.default_rng(1)
    data = rng.normal(5.0, 2.0, size=(4096, 2)).astype(np.float32)
    st = obs_norm_update(ObsNormState.create(2), jnp.asarray(data))
    out = np.asarray(obs_norm_apply(st, jnp.asarray(data)))
    assert abs(out.mean()) < 0.05
    assert abs(out.std() - 1.0) < 0.05


def test_obs_norm_custom_clip():
    st = obs_norm_update(
        ObsNormState.create(1), jax.random.normal(jax.random.PRNGKey(0), (512, 1))
    )
    out = np.asarray(obs_norm_apply(st, jnp.full((1, 1), 1e6), 5.0))
    assert out.max() == pytest.approx(5.0)


# ------------------------------------------------------- return normalizer
def test_return_norm_no_scale_before_stats():
    st = ReturnNormState.create(1, 1)
    st2, r = return_norm_step(
        st, jnp.asarray([1.0]), jnp.zeros(1, jnp.int32),
        jnp.zeros(1, bool), 0.99, 10.0,
    )
    # count < 2: variance undefined -> reward passes through unscaled
    np.testing.assert_allclose(np.asarray(r), [1.0])


def test_return_norm_variance_only_no_mean_shift():
    """Return normalization scales by std but never re-centers
    (normalization.rs:115-260)."""
    st = ReturnNormState.create(1, 1)
    r = jnp.asarray([5.0])
    players = jnp.zeros(1, jnp.int32)
    dones = jnp.zeros(1, bool)
    for _ in range(50):
        st, out = return_norm_step(st, r, players, dones, 0.99, 10.0)
    # all rewards identical & positive: normalized value stays positive
    assert float(out[0]) > 0.0


def test_return_norm_clip_applied():
    st = ReturnNormState.create(1, 1)
    players = jnp.zeros(1, jnp.int32)
    dones = jnp.zeros(1, bool)
    # build small variance, then feed a huge reward
    for v in (1.0, 1.1, 0.9, 1.0, 1.05, 0.95, 1.0, 1.02):
        st, _ = return_norm_step(st, jnp.asarray([v]), players, dones, 0.99, 10.0)
    st, out = return_norm_step(st, jnp.asarray([1e6]), players, dones, 0.99, 10.0)
    assert abs(float(out[0])) <= 10.0 + 1e-5


# ------------------------------------------------------- PopArt
def test_popart_update_tracks_return_stats():
    st = PopArtState.create()
    returns = jnp.asarray([1.0, 3.0, 5.0, 7.0])
    st, old_mean, old_std = popart_update(st, returns, jnp.ones(4))
    assert float(st.mean) == pytest.approx(4.0)
    assert bool(st.initialized)


def test_popart_masked_samples_excluded():
    st = PopArtState.create()
    returns = jnp.asarray([1.0, 100.0, 3.0, 100.0])
    valid = jnp.asarray([1.0, 0.0, 1.0, 0.0])
    st, _m, _s = popart_update(st, returns, valid)
    assert float(st.mean) == pytest.approx(2.0)


def test_popart_normalize_roundtrip_after_updates():
    st = PopArtState.create()
    st, _m, _s = popart_update(
        st, jax.random.normal(jax.random.PRNGKey(0), (256,)) * 7 + 3, jnp.ones(256)
    )
    x = jnp.asarray([0.5, -2.0, 9.0])
    np.testing.assert_allclose(
        np.asarray(popart_denormalize(st, popart_normalize(st, x))),
        np.asarray(x), rtol=1e-5,
    )


def test_popart_head_rescale_identity_before_init():
    kernel = jnp.ones((4, 1))
    bias = jnp.zeros((1,))
    k2, b2 = popart_rescale_value_head(
        kernel, bias, jnp.asarray(0.0), jnp.asarray(1.0),
        jnp.asarray(5.0), jnp.asarray(2.0), do_rescale=jnp.asarray(False),
    )
    np.testing.assert_array_equal(np.asarray(k2), np.asarray(kernel))
    np.testing.assert_array_equal(np.asarray(b2), np.asarray(bias))


def test_popart_head_rescale_formula():
    """W' = W sigma_o/sigma_n; b' = (b sigma_o + mu_o - mu_n)/sigma_n
    (ppo.rs:1599-1653)."""
    kernel = jnp.full((3, 1), 2.0)
    bias = jnp.asarray([1.0])
    mu_o, s_o = jnp.asarray(1.0), jnp.asarray(2.0)
    mu_n, s_n = jnp.asarray(3.0), jnp.asarray(4.0)
    k2, b2 = popart_rescale_value_head(
        kernel, bias, mu_o, s_o, mu_n, s_n, do_rescale=jnp.asarray(True)
    )
    np.testing.assert_allclose(np.asarray(k2), 2.0 * 2.0 / 4.0)
    np.testing.assert_allclose(np.asarray(b2), (1.0 * 2.0 + 1.0 - 3.0) / 4.0)


def test_return_norm_matches_reference_sequential_emulation():
    """The reference updates its global Welford accumulator one env at a
    time and normalizes env e with stats through env e (ppo.rs:390-408,
    normalization.rs:177-201). Emulate that loop in f64 NumPy and check
    the associative_scan implementation reproduces it across multiple
    steps, players, dones, and a pool-turn valid mask — including the
    very first step, where env 0 must pass through unnormalized
    (count 1 < 2) while env 100 is already normalized."""
    from burn_ppo_tpu.ppo.normalization import ReturnNormState

    rng = np.random.default_rng(3)
    E, P, gamma, clip = 256, 3, 0.97, 10.0

    # Reference emulation state (f64 like the Rust normalizer)
    ret = np.zeros((E, P))
    mean, var, count = 0.0, 0.0, 0.0

    st = ReturnNormState.create(E, P)
    for step in range(5):
        rewards = rng.normal(0.0, 2.0, size=E).astype(np.float32)
        acting = rng.integers(0, P, size=E).astype(np.int32)
        dones = rng.random(E) < 0.15
        valid = rng.random(E) < 0.8

        expected = np.empty(E, np.float32)
        for e in range(E):
            p = int(acting[e])
            ret[e, p] = ret[e, p] * gamma + float(rewards[e])
            if valid[e]:
                count += 1.0
                delta = ret[e, p] - mean
                mean += delta / count
                var += delta * (ret[e, p] - mean)
            if count < 2.0:
                expected[e] = rewards[e]
            else:
                std = np.sqrt(var / count + 1e-8)
                expected[e] = np.clip(rewards[e] / std, -clip, clip)
            if dones[e]:
                ret[e, p] = 0.0

        st, out = return_norm_step(
            st,
            jnp.asarray(rewards),
            jnp.asarray(acting),
            jnp.asarray(dones),
            gamma,
            clip,
            valid=jnp.asarray(valid),
        )
        np.testing.assert_allclose(
            np.asarray(out), expected, rtol=2e-4, atol=2e-4,
            err_msg=f"step {step}",
        )
        np.testing.assert_allclose(np.asarray(st.returns), ret, rtol=1e-4, atol=1e-4)
        assert float(st.count) == count


def test_return_norm_finalize_matches_per_step_sequence():
    """Hoisting the stats/normalize half out of the rollout scan must be
    exact: return_norm_finalize over [T, E] == T sequential
    return_norm_step calls (same visitation order, same prefix stats)."""
    from burn_ppo_tpu.ppo.normalization import (
        return_norm_finalize,
        return_norm_roll,
    )

    rng = np.random.default_rng(11)
    T, E, P, gamma, clip = 7, 64, 2, 0.99, 10.0
    rewards = rng.normal(0, 1.5, size=(T, E)).astype(np.float32)
    acting = rng.integers(0, P, size=(T, E)).astype(np.int32)
    dones = rng.random((T, E)) < 0.2
    valid = rng.random((T, E)) < 0.7

    st_seq = ReturnNormState.create(E, P)
    outs = []
    for t in range(T):
        st_seq, o = return_norm_step(
            st_seq, jnp.asarray(rewards[t]), jnp.asarray(acting[t]),
            jnp.asarray(dones[t]), gamma, clip, valid=jnp.asarray(valid[t]),
        )
        outs.append(np.asarray(o))

    st = ReturnNormState.create(E, P)
    returns, samples = st.returns, []
    for t in range(T):
        returns, s = return_norm_roll(
            returns, jnp.asarray(rewards[t]), jnp.asarray(acting[t]),
            jnp.asarray(dones[t]), gamma,
        )
        samples.append(s)
    st2, normalized = return_norm_finalize(
        st, jnp.stack(samples), jnp.asarray(rewards), clip,
        valid=jnp.asarray(valid),
    )
    st2 = st2.replace(returns=returns)
    np.testing.assert_allclose(
        np.asarray(normalized), np.stack(outs), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(st2.returns), np.asarray(st_seq.returns), rtol=1e-5
    )
    assert float(st2.count) == float(st_seq.count)
    np.testing.assert_allclose(float(st2.mean), float(st_seq.mean), rtol=1e-4)
    np.testing.assert_allclose(
        float(st2.m2), float(st_seq.m2), rtol=1e-3, atol=1e-3
    )
