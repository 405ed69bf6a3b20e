"""Tournament contestant-discovery edge cases (reference
tournament.rs: is_checkpoint_dir / enumerate / limit-selection /
best-fallback / display-name suites, tests at 2326+)."""

import json
from pathlib import Path

import pytest

from burn_ppo_tpu.tournament import (
    compute_display_names,
    discover_contestants,
    enumerate_checkpoints,
    get_best_checkpoint,
    is_checkpoint_dir,
    is_run_dir,
    select_checkpoints_with_priority,
)


_PARAMS = None


def _tiny_params():
    global _PARAMS
    if _PARAMS is None:
        import jax

        from burn_ppo_tpu.models.network import ActorCriticNetwork

        net = ActorCriticNetwork(
            network_type="mlp", obs_dim=5, action_count=2,
            hidden_size=8, num_hidden=1,
        )
        _PARAMS = net.init(jax.random.PRNGKey(0))
    return _PARAMS


def mk_ckpt(ckpt_dir: Path, step: int, avg_return=0.0, num_players=1):
    from burn_ppo_tpu.checkpoint import save_pytree

    d = ckpt_dir / f"step_{step:08d}"
    d.mkdir(parents=True, exist_ok=True)
    save_pytree(d / "model.npz", _tiny_params())
    (d / "metadata.json").write_text(
        json.dumps(
            {
                "step": step,
                "avg_return": avg_return,
                "num_players": num_players,
                "env_name": "cartpole",
                "network_type": "mlp",
                "obs_dim": 5,
                "action_count": 2,
                "hidden_size": 8,
                "num_hidden": 1,
                "activation": "tanh",
            }
        )
    )
    return d


def mk_run(base: Path, name: str, steps, avg_returns=None, num_players=1):
    run = base / name
    ckpts = run / "checkpoints"
    ckpts.mkdir(parents=True)
    for i, s in enumerate(steps):
        ar = avg_returns[i] if avg_returns else float(s)
        mk_ckpt(ckpts, s, avg_return=ar, num_players=num_players)
    return run


# ------------------------------------------------------- dir detection
def test_is_checkpoint_dir_detection(tmp_path):
    d = mk_ckpt(tmp_path / "c", 10)
    assert is_checkpoint_dir(d)
    empty = tmp_path / "c" / "step_00000020"
    empty.mkdir()
    assert not is_checkpoint_dir(empty)  # no metadata
    assert not is_checkpoint_dir(tmp_path / "missing")


def test_is_run_dir_detection(tmp_path):
    run = mk_run(tmp_path, "r", [10])
    assert is_run_dir(run)
    assert not is_run_dir(tmp_path / "nope")
    plain = tmp_path / "plain"
    plain.mkdir()
    assert not is_run_dir(plain)


def test_enumerate_skips_non_step_entries(tmp_path):
    ckpts = tmp_path / "checkpoints"
    mk_ckpt(ckpts, 30)
    mk_ckpt(ckpts, 10)
    (ckpts / "latest").symlink_to("step_00000030")
    (ckpts / "step_junk").mkdir()
    (ckpts / "notes.txt").write_text("x")
    out = enumerate_checkpoints(ckpts)
    assert [p.name for p in out] == ["step_00000010", "step_00000030"]


# ---------------------------------------------------------- best choice
def test_get_best_uses_symlink_when_present(tmp_path):
    run = mk_run(tmp_path, "r", [10, 20, 30], avg_returns=[5.0, 50.0, 9.0])
    ckpts = run / "checkpoints"
    (ckpts / "best").symlink_to("step_00000010")
    assert get_best_checkpoint(ckpts).name == "step_00000010"


def test_get_best_fallback_to_avg_return_single_player(tmp_path):
    run = mk_run(tmp_path, "r", [10, 20, 30], avg_returns=[5.0, 50.0, 9.0])
    assert get_best_checkpoint(run / "checkpoints").name == "step_00000020"


def test_get_best_multiplayer_without_symlink_is_latest(tmp_path):
    run = mk_run(tmp_path, "r", [10, 20], num_players=2)
    assert get_best_checkpoint(run / "checkpoints").name == "step_00000020"


def test_get_best_empty_dir_none(tmp_path):
    ckpts = tmp_path / "checkpoints"
    ckpts.mkdir()
    assert get_best_checkpoint(ckpts) is None


# ------------------------------------------------------- limit selection
def test_limit_1_picks_best(tmp_path):
    run = mk_run(tmp_path, "r", [10, 20, 30], avg_returns=[5.0, 50.0, 9.0])
    ckpts = run / "checkpoints"
    sel = select_checkpoints_with_priority(
        ckpts, enumerate_checkpoints(ckpts), 1
    )
    assert [p.name for p in sel] == ["step_00000020"]


def test_limit_2_is_best_then_latest(tmp_path):
    run = mk_run(tmp_path, "r", [10, 20, 30], avg_returns=[5.0, 50.0, 9.0])
    ckpts = run / "checkpoints"
    sel = select_checkpoints_with_priority(
        ckpts, enumerate_checkpoints(ckpts), 2
    )
    assert [p.name for p in sel] == ["step_00000020", "step_00000030"]


def test_limit_zero_empty(tmp_path):
    run = mk_run(tmp_path, "r", [10, 20])
    ckpts = run / "checkpoints"
    assert select_checkpoints_with_priority(
        ckpts, enumerate_checkpoints(ckpts), 0
    ) == []


def test_limit_split_between_runs(tmp_path):
    a = mk_run(tmp_path, "a", [10, 20, 30, 40])
    b = mk_run(tmp_path, "b", [10, 20, 30, 40])
    cs = discover_contestants([a, b], limit_per_run=2)
    assert len(cs) == 4  # 2 from each run


# --------------------------------------------------------- discovery
def test_discover_invalid_path_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        discover_contestants([tmp_path / "nothing"])


def test_discover_empty_checkpoints_dir(tmp_path):
    run = mk_run(tmp_path, "r", [])
    cs = discover_contestants([run])
    assert cs == []


def test_discover_single_checkpoint_path(tmp_path):
    d = mk_ckpt(tmp_path / "checkpoints", 42)
    cs = discover_contestants([d])
    assert len(cs) == 1 and cs[0].step == 42


def test_discover_dedups_same_checkpoint(tmp_path):
    d = mk_ckpt(tmp_path / "checkpoints", 42)
    cs = discover_contestants([d, d])
    assert len(cs) == 1


def test_discover_with_random_appends_baseline(tmp_path):
    d = mk_ckpt(tmp_path / "checkpoints", 42)
    cs = discover_contestants([d], include_random=True)
    assert cs[-1].name == "Random"
    assert cs[-1].source.kind == "random"


def test_discover_shuffle_deterministic(tmp_path):
    # Multi-source tournaments shuffle into positional seeding
    # (tournament.rs:681-699); one run never shuffles.
    r1 = mk_run(tmp_path, "r1", [10, 20, 30, 40, 50])
    r2 = mk_run(tmp_path, "r2", [10, 20, 30, 40, 50])
    a = [c.name for c in discover_contestants([r1, r2], shuffle_seed=3)]
    b = [c.name for c in discover_contestants([r1, r2], shuffle_seed=3)]
    c = [c.name for c in discover_contestants([r1, r2], shuffle_seed=4)]
    assert a == b
    assert a != c
    # Positional seeds after the shuffle
    cs = discover_contestants([r1, r2], shuffle_seed=3)
    assert [x.initial_seed for x in cs] == [float(i) for i in range(len(cs))]


def test_discover_single_run_seeds_by_avg_return_no_shuffle(tmp_path):
    run = mk_run(tmp_path, "r", [10, 20, 30, 40, 50])
    a = [c.name for c in discover_contestants([run], shuffle_seed=3)]
    b = [c.name for c in discover_contestants([run], shuffle_seed=4)]
    assert a == b  # single training run: no shuffle (tournament.rs:563)
    cs = discover_contestants([run], include_random=True)
    assert cs[-1].name == "Random"
    assert cs[-1].initial_seed == float("-inf")  # always lowest seed


# -------------------------------------------------------- display names
def test_display_names_identical_paths():
    p = Path("/runs/a/checkpoints/step_00000010")
    names = compute_display_names([p, p])
    assert len(names) == 2 and names[0] == names[1]


def test_display_names_different_length_paths():
    names = compute_display_names(
        [
            Path("/runs/a/checkpoints/step_00000010"),
            Path("/other/deep/runs/b/checkpoints/step_00000020"),
        ]
    )
    assert len(names) == 2
    assert names[0] != names[1]
    assert names[0].endswith("step_00000010")
    assert names[1].endswith("step_00000020")


def test_display_names_empty():
    assert compute_display_names([]) == []


def test_display_names_middle_run_collapsed():
    names = compute_display_names(
        [
            Path("/runs/a/checkpoints/step_00000010"),
            Path("/runs/b/checkpoints/step_00000020"),
        ]
    )
    # "/runs" strips as common prefix; "checkpoints" collapses to "..."
    assert names == ["a/.../step_00000010", "b/.../step_00000020"]
