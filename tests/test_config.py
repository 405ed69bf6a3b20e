"""Config system tests (reference src/config.rs has ~55 in-module tests:
TOML parsing, CLI overrides, resume policy, run names, durations,
player-count modes, validation)."""

import pytest

from burn_ppo_tpu.config import (
    Config,
    PlayerCountMode,
    generate_run_name,
    parse_duration,
)
from burn_ppo_tpu.schedule import Schedule


# ---------------------------------------------------------------- duration
def test_parse_duration_seconds():
    assert parse_duration("30s") == 30.0


def test_parse_duration_minutes():
    assert parse_duration("5m") == 300.0


def test_parse_duration_hours():
    assert parse_duration("2h") == 7200.0


def test_parse_duration_fractional():
    assert parse_duration("1.5h") == 5400.0


def test_parse_duration_whitespace():
    assert parse_duration(" 10m ") == 600.0


@pytest.mark.parametrize("bad", ["", "5", "m5", "5d", "5 years", "-3s"])
def test_parse_duration_invalid(bad):
    with pytest.raises(ValueError):
        parse_duration(bad)


# ---------------------------------------------------------- player count
def test_player_count_from_int():
    pc = PlayerCountMode.parse(3)
    assert pc.mode == "fixed" and pc.count == 3
    assert pc.get_fixed_count() == 3


def test_player_count_from_str():
    assert PlayerCountMode.parse("5").count == 5


def test_player_count_uniform_random():
    pc = PlayerCountMode.parse(
        {"mode": "uniform_random", "min_players": 2, "max_players": 5}
    )
    assert pc.mode == "uniform_random"
    assert pc.get_fixed_count() == 2  # reference: UniformRandom -> min


def test_get_fixed_count_reference_parity():
    # Reference config.rs:675-681:
    #   Fixed { count } => count
    #   UniformRandom { min, .. } | Curriculum { min, .. } => min
    #   WeightedRandom { .. } => 4
    assert PlayerCountMode.parse(6).get_fixed_count() == 6
    assert (
        PlayerCountMode.parse(
            {"type": "UniformRandom", "min": 3, "max": 6}
        ).get_fixed_count()
        == 3
    )
    assert (
        PlayerCountMode.parse(
            {"type": "Curriculum", "min": 2, "max": 6, "warmup_steps": 1000}
        ).get_fixed_count()
        == 2
    )
    assert (
        PlayerCountMode.parse(
            {"type": "WeightedRandom", "weights": [0.2] * 5}
        ).get_fixed_count()
        == 4
    )


def test_curriculum_milestones_fixed_count_and_roundtrip():
    # A milestones-spelled curriculum starts at its earliest milestone's
    # count, and the TOML round-trip (the run-dir snapshot consumed by
    # --resume) must preserve that count exactly.
    pc = PlayerCountMode.parse(
        {"mode": "curriculum", "milestones": [[6, 1_000_000], [4, 0]],
         "min_players": 4}
    )
    assert pc.get_fixed_count() == 4  # earliest milestone, not min default
    rt = PlayerCountMode.parse(pc.to_toml_value())
    assert rt.get_fixed_count() == pc.get_fixed_count()
    assert rt.min_players == 4  # min/max/warmup survive the snapshot
    assert rt == pc


def test_player_count_sample_semantics():
    # Reference config.rs:683-724 sample() behavior.
    import random

    rng = random.Random(0)
    assert PlayerCountMode.parse(3).sample(rng, 0) == 3
    pc = PlayerCountMode.parse({"type": "UniformRandom", "min": 2, "max": 4})
    draws = {pc.sample(rng, 0) for _ in range(200)}
    assert draws == {2, 3, 4}
    pc = PlayerCountMode.parse(
        {"type": "WeightedRandom", "weights": [0.0, 0.0, 1.0, 0.0, 0.0]}
    )
    assert all(pc.sample(rng, 0) == 4 for _ in range(20))
    # All-zero weights panic in the reference (WeightedIndex::new).
    with pytest.raises(ValueError):
        PlayerCountMode.parse(
            {"type": "WeightedRandom", "weights": [0.0] * 5}
        ).sample(rng, 0)
    # Curriculum min/max/warmup: linear ramp, max after warmup.
    pc = PlayerCountMode.parse(
        {"type": "Curriculum", "min": 2, "max": 6, "warmup_steps": 100}
    )
    assert pc.sample(rng, 0) == 2
    assert pc.sample(rng, 50) == 4
    assert pc.sample(rng, 100) == 6
    assert pc.sample(rng, 10**9) == 6
    # Exact-half progress rounds AWAY from zero like Rust f32::round
    # (config.rs:716-722), not banker's: progress 1/8 * range 4 = 0.5.
    pc8 = PlayerCountMode.parse(
        {"type": "Curriculum", "min": 2, "max": 6, "warmup_steps": 8}
    )
    assert pc8.sample(rng, 1) == 3  # 2 + round(0.5) = 3, not 2
    # Milestones spelling walks the schedule.
    pc = PlayerCountMode.parse(
        {"mode": "curriculum", "milestones": [[2, 0], [4, 1000], [6, 2000]]}
    )
    assert pc.sample(rng, 0) == 2
    assert pc.sample(rng, 1500) == 4
    assert pc.sample(rng, 2000) == 6


def test_curriculum_warmup_steps_roundtrip():
    pc = PlayerCountMode.parse(
        {"mode": "curriculum", "min_players": 2, "max_players": 6,
         "warmup_steps": 50_000}
    )
    assert pc.warmup_steps == 50_000
    t = pc.to_toml_value()
    assert t["warmup_steps"] == 50_000 and t["min_players"] == 2
    assert PlayerCountMode.parse(t) == pc


def test_player_count_reference_toml_spelling():
    # reference TOML uses {"type": "UniformRandom"} (config.rs:648)
    pc = PlayerCountMode.parse({"type": "UniformRandom", "min": 2, "max": 6})
    assert pc.mode == "uniform_random"
    assert pc.min_players == 2 and pc.max_players == 6


def test_player_count_weighted():
    pc = PlayerCountMode.parse(
        {"mode": "weighted_random", "weights": [0.5, 0.3, 0.2]}
    )
    assert pc.weights == (0.5, 0.3, 0.2)
    assert pc.to_toml_value()["weights"] == [0.5, 0.3, 0.2]


def test_player_count_curriculum():
    pc = PlayerCountMode.parse(
        {"mode": "curriculum", "milestones": [[2, 0], [4, 1_000_000]]}
    )
    assert pc.milestones == ((2, 0), (4, 1_000_000))
    assert pc.to_toml_value()["milestones"] == [[2, 0], [4, 1_000_000]]


def test_player_count_fixed_toml_roundtrip():
    assert PlayerCountMode.parse(4).to_toml_value() == 4


def test_player_count_invalid():
    with pytest.raises(ValueError):
        PlayerCountMode.parse(3.5)


# ------------------------------------------------------------- construction
def test_default_config_valid():
    Config().validate()


def test_post_init_coerces_schedules():
    cfg = Config(learning_rate=1e-3, entropy_coef=[[0.05, 0], [0.0, 1000]])
    assert isinstance(cfg.learning_rate, Schedule)
    assert cfg.learning_rate.get(0) == 1e-3
    assert cfg.entropy_coef.get(500) == pytest.approx(0.025)


def test_post_init_coerces_player_count():
    assert Config(player_count=2).player_count.count == 2


def test_from_dict_unknown_key():
    with pytest.raises(ValueError, match="Unknown config keys"):
        Config.from_dict({"env": "cartpole", "nonsense_key": 1})


def test_optional_adaptive_entropy_schedule():
    cfg = Config(adaptive_entropy=[[0.9, 0], [0.3, 10_000_000]])
    assert isinstance(cfg.adaptive_entropy, Schedule)
    assert Config().adaptive_entropy is None


# ------------------------------------------------------------- num_envs
def test_resolve_num_envs_explicit():
    assert Config(num_envs=64).resolve_num_envs(1) == 64


def test_resolve_num_envs_rounds_to_mesh():
    assert Config(num_envs=30).resolve_num_envs(8) == 32


def test_resolve_num_envs_auto_positive():
    n = Config(num_envs="auto").resolve_num_envs(4)
    assert n >= 4 and n % 4 == 0


def test_resolve_num_envs_min_is_mesh():
    assert Config(num_envs=1).resolve_num_envs(8) == 8


# ------------------------------------------------- effective normalize
def test_normalize_returns_default_single_player():
    assert Config().effective_normalize_returns(1) is True


def test_normalize_returns_default_multiplayer_off():
    # default = single-player-only (main.rs:243)
    assert Config().effective_normalize_returns(2) is False


def test_normalize_returns_explicit_override():
    assert Config(normalize_returns=True).effective_normalize_returns(4) is True
    assert Config(normalize_returns=False).effective_normalize_returns(1) is False


# ------------------------------------------------------------- validation
@pytest.mark.parametrize(
    "kw",
    [
        {"num_steps": 0},
        {"gamma": 0.0},
        {"gamma": 1.5},
        {"gae_lambda": -0.1},
        {"clip_epsilon": 0.0},
        {"clip_epsilon": 1.0},
        {"activation": "gelu"},
        {"network_type": "transformer"},
        {"num_epochs": 0},
        {"num_minibatches": 0},
        {"opponent_pool_fraction": 1.5},
        {"learning_rate": 0.0},
        {"max_training_time": "5 days"},
        {"compute_dtype": "float16"},
        {"pool_rotation_interval": 0},
        # Non-power-of-two would silently run at the next power of two
        # below it (train.py window-cap quantization) — reject instead.
        {"pool_rotation_interval": 6},
        # Reference Config::validate parity (config.rs:1483-1535).
        {"entropy_coef": -0.01},
        {"reward_shaping_coef": -0.1},
        {"adaptive_entropy": 1.0, "adaptive_entropy_min_coef": -0.001},
        {"adaptive_entropy": 1.0, "adaptive_entropy_max_coef": 0.0005,
         "adaptive_entropy_min_coef": 0.001},
        {"adaptive_entropy": 1.0, "adaptive_entropy_delta": 0.0},
        {"env": "chess"},
        # Rotation slots pack to int8 in the pool record log.
        {"max_active_opponents": 128},
        {"max_active_opponents": 0},
    ],
)
def test_validate_rejects(kw):
    with pytest.raises(ValueError):
        Config(**kw).validate()


@pytest.mark.parametrize("w", [1, 2, 8, 64])
def test_validate_accepts_pow2_rotation_interval(w):
    Config(pool_rotation_interval=w).validate()


def test_validate_collects_multiple_errors():
    with pytest.raises(ValueError) as ei:
        Config(num_steps=0, gamma=2.0).validate()
    msg = str(ei.value)
    assert "num_steps" in msg and "gamma" in msg


# ----------------------------------------------------------- toml round trip
def test_save_load_roundtrip(tmp_path):
    cfg = Config(
        env="connect_four",
        num_envs=128,
        num_steps=64,
        learning_rate=[[1e-3, 0], [1e-4, 40_000_000]],
        clip_epsilon=0.1,
        entropy_coef=0.05,
        target_kl=0.02,
        hidden_size=512,
        total_steps=20_000_000,
        normalize_obs=True,
        seed=7,
    )
    path = tmp_path / "config.toml"
    cfg.save_toml(path)
    loaded = Config.load(path)
    assert loaded.env == "connect_four"
    assert loaded.num_envs == 128
    assert loaded.learning_rate.get(0) == pytest.approx(1e-3)
    assert loaded.learning_rate.get(40_000_000) == pytest.approx(1e-4)
    assert loaded.clip_epsilon == 0.1
    assert loaded.target_kl == 0.02
    assert loaded.seed == 7
    assert loaded.to_dict() == cfg.to_dict()


def test_save_toml_skips_none(tmp_path):
    cfg = Config()
    path = tmp_path / "c.toml"
    cfg.save_toml(path)
    text = path.read_text()
    assert "target_kl" not in text  # None fields omitted
    assert "seed" not in text


def test_load_requires_env(tmp_path):
    p = tmp_path / "c.toml"
    p.write_text("num_steps = 8\n")
    with pytest.raises(ValueError, match="must specify 'env'"):
        Config.load(p)


def test_load_player_count_table(tmp_path):
    p = tmp_path / "c.toml"
    p.write_text('env = "skull"\nplayer_count = 4\n')
    assert Config.load(p).player_count.count == 4


def test_shipped_configs_parse_and_validate():
    import glob

    paths = glob.glob("configs/*.toml")
    assert len(paths) >= 7
    for path in paths:
        Config.load(path).validate()


# ----------------------------------------------------------- overrides
def test_apply_overrides_fresh():
    cfg = Config(env="cartpole").apply_overrides(
        {"num_steps": 256, "gamma": 0.97, "seed": None}
    )
    assert cfg.num_steps == 256
    assert cfg.gamma == 0.97
    assert cfg.seed is None  # None overrides ignored


def test_apply_overrides_schedule_string():
    cfg = Config().apply_overrides({"learning_rate": Schedule.parse_cli("1e-3@0,1e-4@30M").to_toml_value()})
    assert cfg.learning_rate.get(0) == pytest.approx(1e-3)
    assert cfg.learning_rate.get(30_000_000) == pytest.approx(1e-4)


def test_resume_allows_total_steps():
    cfg = Config(total_steps=1000).apply_overrides(
        {"total_steps": 5000}, resume=True
    )
    assert cfg.total_steps == 5000


def test_resume_allows_max_training_time():
    cfg = Config().apply_overrides({"max_training_time": "2h"}, resume=True)
    assert cfg.max_training_time == "2h"


def test_resume_rejects_other_overrides():
    with pytest.raises(ValueError, match="--fork"):
        Config().apply_overrides({"learning_rate": 1e-4}, resume=True)


def test_resume_rejects_lists_all_illegal_keys():
    with pytest.raises(ValueError) as ei:
        Config().apply_overrides(
            {"gamma": 0.9, "hidden_size": 128}, resume=True
        )
    assert "gamma" in str(ei.value) and "hidden_size" in str(ei.value)


def test_resume_ignores_none_values():
    cfg = Config().apply_overrides(
        {"gamma": None, "total_steps": 99}, resume=True
    )
    assert cfg.total_steps == 99


# ----------------------------------------------------------- run names
def test_generate_run_name_first(tmp_path):
    assert generate_run_name(tmp_path, "cartpole") == "cartpole_001"


def test_generate_run_name_increments(tmp_path):
    (tmp_path / "cartpole_001").mkdir()
    (tmp_path / "cartpole_002").mkdir()
    assert generate_run_name(tmp_path, "cartpole") == "cartpole_003"


def test_generate_run_name_fills_gap(tmp_path):
    (tmp_path / "skull_002").mkdir()
    assert generate_run_name(tmp_path, "skull") == "skull_001"


def test_generate_run_name_child(tmp_path):
    (tmp_path / "skull_001_child_001").mkdir()
    assert (
        generate_run_name(tmp_path, "skull", parent="skull_001")
        == "skull_001_child_002"
    )


def test_generate_run_name_ignores_non_numeric(tmp_path):
    (tmp_path / "cartpole_notanumber").mkdir()
    assert generate_run_name(tmp_path, "cartpole") == "cartpole_001"


def test_max_training_seconds():
    assert Config(max_training_time="90s").max_training_seconds() == 90.0
    assert Config().max_training_seconds() is None


def test_validate_rejects_zero_conv_layers_for_cnn():
    cfg = Config(env="connect_four", network_type="cnn", num_conv_layers=0)
    with pytest.raises(ValueError, match="num_conv_layers"):
        cfg.validate()


def test_validate_allows_zero_conv_layers_for_mlp():
    Config(env="cartpole", network_type="mlp", num_conv_layers=0).validate()
