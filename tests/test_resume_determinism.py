"""Resume determinism: two resumes from the same checkpoint are
BIT-IDENTICAL (the point of persisting RNG state, optimizer moments and
all normalizers; reference checkpoint.rs:390-426 saves rng_state.bin
for the same guarantee).

Note the guarantee is determinism OF the resumed run, not equivalence
to an uninterrupted run: env states are not checkpointed — the
reference likewise recreates its VecEnv fresh on every startup
(main.rs:196), abandoning in-flight episodes at the resume point."""

import jax
import numpy as np
import pytest

from burn_ppo_tpu.config import Config
from burn_ppo_tpu.schedule import Schedule
from burn_ppo_tpu.train import Trainer


def cfg_for(total_steps, **kw):
    base = dict(
        env="cartpole",
        num_envs=4,
        num_steps=8,
        total_steps=total_steps,
        hidden_size=8,
        num_hidden=1,
        num_minibatches=2,
        num_epochs=2,
        learning_rate=Schedule.constant(1e-3),
        checkpoint_freq=64,
        log_freq=64,
        seed=123,
        opponent_pool_fraction=0.0,
        normalize_obs=True,
        normalize_values=True,
    )
    base.update(kw)
    return Config(**base)


def params_of(trainer):
    return [np.asarray(x) for x in jax.tree_util.tree_leaves(
        jax.device_get(trainer.state.params)
    )]


@pytest.mark.parametrize("use_windows", [True, False])
def test_two_resumes_are_bit_identical(tmp_path, use_windows):
    kw = {}
    if not use_windows:
        # Adaptive entropy disables window fusion -> exercises the
        # unfused per-update path too.
        kw["adaptive_entropy"] = Schedule.constant(0.5)
    t_a = Trainer(cfg_for(64, **kw), tmp_path / "base", quiet=True)
    t_a.train()
    # Resolve the symlink NOW: the resumed runs save new checkpoints
    # into the same dir, repointing `latest`.
    ckpt = (tmp_path / "base" / "checkpoints" / "latest").resolve()
    assert ckpt.name == "step_00000064"

    results = []
    for tag in ("r1", "r2"):
        t = Trainer(
            cfg_for(128, **kw),
            tmp_path / "base",
            resume_from=ckpt,
            quiet=True,
        )
        assert t.global_step == 64
        t.train()
        results.append(
            (
                params_of(t),
                np.asarray(jax.device_get(t.state.obs_norm.mean)),
                np.asarray(jax.device_get(t.state.obs_norm.count)),
                np.asarray(jax.device_get(t.state.update_key)),
            )
        )

    for a, b in zip(results[0][0], results[1][0]):
        np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(results[0][1], results[1][1])
    np.testing.assert_array_equal(results[0][2], results[1][2])
    np.testing.assert_array_equal(results[0][3], results[1][3])
    # And the resumed run actually trained (params differ from restore).
    t_check = Trainer(
        cfg_for(128, **kw), tmp_path / "base", resume_from=ckpt, quiet=True
    )
    restored = params_of(t_check)
    assert any(
        not np.array_equal(a, b) for a, b in zip(results[0][0], restored)
    )


def test_resume_continues_rng_chain(tmp_path):
    t_a = Trainer(cfg_for(64), tmp_path / "r", quiet=True)
    pre_key = np.asarray(jax.device_get(t_a.state.update_key))
    t_a.train()
    post_key = np.asarray(jax.device_get(t_a.state.update_key))
    assert not np.array_equal(pre_key, post_key)  # chain advanced
    t_b = Trainer(
        cfg_for(128),
        tmp_path / "r",
        resume_from=tmp_path / "r" / "checkpoints" / "latest",
        quiet=True,
    )
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(t_b.state.update_key)), post_key
    )
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(t_b.state.carry.key)),
        np.asarray(jax.device_get(t_a.state.carry.key)),
    )
