"""Schedule parity tests (reference src/schedule.rs tests)."""

import pytest

from burn_ppo_tpu.schedule import Schedule, parse_step_with_suffix


def test_constant():
    s = Schedule.constant(0.001)
    assert s.get(0) == 0.001
    assert s.get(1_000_000) == 0.001
    assert s.is_constant


def test_linear_interpolation():
    s = Schedule.of([(0.001, 0), (0.0001, 30_000_000)])
    assert s.get(15_000_000) == pytest.approx(0.00055)
    assert s.get(0) == 0.001
    assert s.get(30_000_000) == 0.0001
    assert s.get(60_000_000) == 0.0001


def test_before_first_milestone():
    s = Schedule.of([(0.5, 1000), (1.0, 2000)])
    assert s.get(0) == 0.5
    assert s.get(500) == 0.5
    assert s.get(1500) == pytest.approx(0.75)


def test_empty_schedule():
    assert Schedule().get(100) == 0.0


def test_multi_segment():
    s = Schedule.of([(1.0, 0), (0.5, 100), (0.5, 200), (0.0, 300)])
    assert s.get(50) == pytest.approx(0.75)
    assert s.get(150) == pytest.approx(0.5)
    assert s.get(250) == pytest.approx(0.25)


def test_parse_cli_static():
    s = Schedule.parse_cli("0.001")
    assert s.is_constant
    assert s.get(0) == 0.001


def test_parse_cli_schedule_with_suffixes():
    s = Schedule.parse_cli("0.001@0,0.0001@30M")
    assert s.milestones[1][1] == 30_000_000
    s2 = Schedule.parse_cli("1.0@5K,0.5@2.5M")
    assert s2.milestones[0][1] == 5_000
    assert s2.milestones[1][1] == 2_500_000


def test_parse_cli_sorts_milestones():
    s = Schedule.parse_cli("0.5@100,1.0@0")
    assert s.milestones[0] == (1.0, 0)


def test_parse_cli_invalid():
    with pytest.raises(ValueError):
        Schedule.parse_cli("0.1@")
    with pytest.raises(ValueError):
        Schedule.parse_cli("a@b")


def test_parse_step_suffix():
    assert parse_step_with_suffix("30M") == 30_000_000
    assert parse_step_with_suffix("5k") == 5_000
    assert parse_step_with_suffix("42") == 42
    with pytest.raises(ValueError):
        parse_step_with_suffix("-5")


def test_parse_toml_forms():
    assert Schedule.parse(0.01).is_constant
    s = Schedule.parse([[0.001, 0], [0.0001, 30_000_000]])
    assert s.get(15_000_000) == pytest.approx(0.00055)
    assert Schedule.parse("0.5@0,0.1@1M").milestones[1][1] == 1_000_000


def test_to_toml_value_roundtrip():
    s = Schedule.of([(0.001, 0), (0.0001, 30_000_000)])
    assert Schedule.parse(s.to_toml_value()) == s
    c = Schedule.constant(0.3)
    assert Schedule.parse(c.to_toml_value()) == c


def test_parse_step_suffix_case_insensitive():
    from burn_ppo_tpu.schedule import parse_step_with_suffix

    assert parse_step_with_suffix("30m") == 30_000_000
    assert parse_step_with_suffix("2k") == 2_000
    assert parse_step_with_suffix("1.5M") == 1_500_000
    assert parse_step_with_suffix(" 40M ") == 40_000_000


def test_parse_step_negative_rejected():
    from burn_ppo_tpu.schedule import parse_step_with_suffix

    with pytest.raises(ValueError):
        parse_step_with_suffix("-5K")
    with pytest.raises(ValueError):
        parse_step_with_suffix("")


def test_parse_accepts_existing_schedule():
    s = Schedule.constant(0.5)
    assert Schedule.parse(s) is s


def test_parse_rejects_bad_shapes():
    with pytest.raises(ValueError):
        Schedule.parse([[1.0]])
    with pytest.raises(ValueError):
        Schedule.parse([])
    with pytest.raises(ValueError):
        Schedule.parse(object())


def test_exact_milestone_values():
    s = Schedule.parse([[1.0, 0], [0.5, 100], [0.0, 200]])
    assert s.get(0) == 1.0
    assert s.get(100) == 0.5
    assert s.get(200) == 0.0
    assert s.get(1_000_000) == 0.0


def test_is_constant_property():
    assert Schedule.constant(3.0).is_constant
    assert not Schedule.parse([[1.0, 0], [0.0, 10]]).is_constant
    # single milestone at a nonzero step is NOT "constant" (held before)
    assert not Schedule.of([(1.0, 5)]).is_constant


def test_str_roundtrip_through_cli_parse():
    s = Schedule.parse([[1e-3, 0], [1e-4, 30_000_000]])
    s2 = Schedule.parse_cli(str(s))
    assert s2.milestones == s.milestones
