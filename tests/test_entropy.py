"""Adaptive entropy controller tests (reference src/entropy.rs has 11)."""

import math

import pytest

from burn_ppo_tpu.ppo.entropy import AdaptiveEntropyController
from burn_ppo_tpu.schedule import Schedule


def make(target=0.5, actions=4, initial=0.01, **kw):
    return AdaptiveEntropyController(
        Schedule.constant(target), actions, initial, **kw
    )


def test_target_entropy_is_ratio_of_max():
    c = make(target=0.5, actions=4)
    assert c.target_entropy(0) == pytest.approx(0.5 * math.log(4))


def test_no_adjustment_before_first_observation():
    c = make(initial=0.01)
    coef, target = c.get_coefficient(0)
    assert coef == 0.01
    assert target == pytest.approx(0.5 * math.log(4))


def test_increases_when_entropy_below_target():
    c = make(initial=0.01, delta=0.001)
    c.record_entropy(0.1)  # target ~0.69
    coef, _ = c.get_coefficient(0)
    assert coef == pytest.approx(0.011)


def test_decreases_when_entropy_above_target():
    c = make(initial=0.01, delta=0.001)
    c.record_entropy(2.0)
    coef, _ = c.get_coefficient(0)
    assert coef == pytest.approx(0.009)


def test_exact_target_nudges_up_like_rust_signum():
    """entropy.rs:82 uses f64::signum, and signum(+0.0) is +1.0: an
    exactly-on-target observation still moves the coefficient UP by
    delta (the reference's sign(0)=0 comment misstates its stdlib)."""
    c = make(target=0.5, actions=4, initial=0.01, delta=0.001)
    c.record_entropy(0.5 * math.log(4))
    coef, _ = c.get_coefficient(0)
    assert coef == pytest.approx(0.011)


def test_clamped_at_max():
    c = make(initial=0.0999, delta=0.01, max_coef=0.1)
    c.record_entropy(0.0)
    coef, _ = c.get_coefficient(0)
    assert coef == 0.1
    c.record_entropy(0.0)
    coef, _ = c.get_coefficient(0)
    assert coef == 0.1  # stays pinned


def test_clamped_at_min():
    c = make(initial=0.0015, delta=0.01, min_coef=0.001)
    c.record_entropy(100.0)
    coef, _ = c.get_coefficient(0)
    assert coef == 0.001


def test_scheduled_target_decays():
    sched = Schedule.parse([[0.9, 0], [0.1, 1000]])
    c = AdaptiveEntropyController(sched, 8, 0.01)
    t0 = c.target_entropy(0)
    t_mid = c.target_entropy(500)
    t_end = c.target_entropy(1000)
    assert t0 == pytest.approx(0.9 * math.log(8))
    assert t_end == pytest.approx(0.1 * math.log(8))
    assert t_end < t_mid < t0


def test_converges_toward_band():
    """Bang-bang walk: with entropy permanently low, coef staircases up."""
    c = make(initial=0.01, delta=0.002, max_coef=0.05)
    for _ in range(100):
        c.record_entropy(0.0)
        coef, _ = c.get_coefficient(0)
    assert coef == pytest.approx(0.05)


def test_controller_state_is_ephemeral():
    # The reference does not checkpoint the adaptive-entropy controller
    # (main.rs:661-669): a resume restarts from the configured initial
    # coefficient. Mirror that: no persistence surface at all.
    c = make(initial=0.02)
    assert not hasattr(c, "state_dict") and not hasattr(c, "load_state_dict")


# ---------------------------------------------------------------------------
# Device controller (TrainState.ent_state) vs host controller equivalence
# ---------------------------------------------------------------------------
def test_device_controller_matches_host_over_trajectory():
    """The fused-step controller (adaptive_entropy_step/record) must
    replay the host controller's coefficient sequence exactly over a
    scripted entropy trajectory, including the no-first-observation
    hold, clamping episodes and a decaying target schedule."""
    import numpy as np

    from burn_ppo_tpu.ppo.entropy import (
        AdaptiveEntropyState,
        adaptive_entropy_record,
        adaptive_entropy_step,
    )

    sched = Schedule.parse([[0.8, 0], [0.1, 900]])
    host = AdaptiveEntropyController(
        sched, 16, 0.01, min_coef=0.002, max_coef=0.03, delta=0.004
    )
    dev = AdaptiveEntropyState.create(0.01)

    rng = np.random.default_rng(3)
    entropies = np.concatenate(
        [
            rng.uniform(0.0, 3.0, size=30),  # random walk
            np.zeros(10),  # slam into max clamp
            np.full(10, 50.0),  # slam into min clamp
            np.full(5, host.target_entropy(0)),  # exact-target (signum +1)
        ]
    )
    for i, e in enumerate(entropies):
        step = i * 10
        h_coef, h_target = host.get_coefficient(step)
        d_coef, dev = adaptive_entropy_step(
            dev, h_target, 0.002, 0.03, 0.004
        )
        assert float(d_coef) == pytest.approx(h_coef, abs=1e-7), (
            f"iter {i}: device {float(d_coef)} vs host {h_coef}"
        )
        host.record_entropy(float(e))
        dev = adaptive_entropy_record(dev, float(e))


def test_device_controller_holds_before_first_observation():
    from burn_ppo_tpu.ppo.entropy import (
        AdaptiveEntropyState,
        adaptive_entropy_step,
    )

    dev = AdaptiveEntropyState.create(0.02)
    coef, dev = adaptive_entropy_step(dev, 1.0, 0.001, 0.1, 0.01)
    assert float(coef) == pytest.approx(0.02)
    coef, dev = adaptive_entropy_step(dev, 1.0, 0.001, 0.1, 0.01)
    assert float(coef) == pytest.approx(0.02)


def test_adaptive_training_uses_windows_and_reports_coef():
    """An adaptive-entropy Trainer keeps fused K-update windows (the
    controller lives in TrainState.ent_state) and surfaces the device
    coefficient in the summary metrics."""
    import tempfile

    from burn_ppo_tpu.config import Config
    from burn_ppo_tpu.train import Trainer

    cfg = Config(
        env="cartpole", num_envs=4, num_steps=8, total_steps=4 * 8 * 6,
        hidden_size=8, num_hidden=1, num_minibatches=2, num_epochs=1,
        seed=0, opponent_pool_fraction=0.0, log_freq=10**9,
        checkpoint_freq=10**9, adaptive_entropy="0.5",
        adaptive_entropy_delta=0.005,
    )
    with tempfile.TemporaryDirectory() as d:
        t = Trainer(cfg, d, quiet=True)
        assert t.use_windows
        assert t.state.ent_state is not None
        summary = t.train()
        assert "train/adaptive_ent_coef" in summary
        lo = cfg.adaptive_entropy_min_coef
        hi = cfg.adaptive_entropy_max_coef
        assert lo <= summary["train/adaptive_ent_coef"] <= hi


def test_adaptive_pool_profiling_logs_device_coefficient():
    """Pool training preempts the unfused profiling branch, so the
    readback must take the device coefficient, not close the (unused)
    host controller's loop: with adaptive + pool + --profile-phases the
    logged train/entropy_coef must stay inside the controller clamp,
    never the raw entropy TARGET (0.5*ln(7) ~ 0.97 for connect_four,
    10x the max coefficient)."""
    import json
    import tempfile
    from pathlib import Path

    from burn_ppo_tpu.config import Config
    from burn_ppo_tpu.train import Trainer

    steps_per_update = 4 * 8
    cfg = Config(
        env="connect_four", num_envs=4, num_steps=8,
        total_steps=steps_per_update * 6,
        hidden_size=8, num_hidden=1, num_minibatches=2, num_epochs=1,
        seed=0, opponent_pool_fraction=0.25, max_active_opponents=2,
        log_freq=steps_per_update, checkpoint_freq=steps_per_update,
        adaptive_entropy="0.5", adaptive_entropy_delta=0.005,
    )
    with tempfile.TemporaryDirectory() as d:
        Trainer(cfg, d, quiet=True, profile_phases=True).train()
        coefs = [
            row["value"]
            for row in map(
                json.loads,
                (Path(d) / "metrics.jsonl").read_text().splitlines(),
            )
            if row.get("name") == "train/entropy_coef"
        ]
        assert coefs, "no entropy_coef series logged"
        hi = cfg.adaptive_entropy_max_coef
        assert all(c <= hi + 1e-9 for c in coefs), coefs
