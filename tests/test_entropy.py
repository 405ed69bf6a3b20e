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


def test_no_move_when_exactly_on_target():
    c = make(target=0.5, actions=4, initial=0.01)
    c.record_entropy(0.5 * math.log(4))
    coef, _ = c.get_coefficient(0)
    assert coef == 0.01


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
