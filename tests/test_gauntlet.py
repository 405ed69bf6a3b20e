"""Gauntlet registry e2e: register checkpoints from tiny runs into an
isolated registry, rate with the Swiss tournament, Random anchored at
1000 (scripts/gauntlet.py — the frozen cross-round strength gauge)."""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def tiny_c4_run(tmp_path_factory):
    base = tmp_path_factory.mktemp("gauntlet")
    cfg = base / "c4.toml"
    cfg.write_text(
        "\n".join(
            [
                'env = "connect_four"',
                "num_envs = 4",
                "num_steps = 8",
                "total_steps = 96",
                "hidden_size = 8",
                "num_hidden = 1",
                "checkpoint_freq = 32",
                "log_freq = 32",
                "seed = 3",
                "opponent_pool_fraction = 0.0",
            ]
        )
        + "\n"
    )
    run_dir = base / "run"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, "-m", "burn_ppo_tpu", "train", "-c", str(cfg),
         "--run-dir", str(run_dir), "--quiet"],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=600,
    )
    assert r.returncode == 0, r.stderr
    return base, run_dir


def _gauntlet(base, *args):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    import scripts.gauntlet as g  # noqa: F401 (import check)

    return subprocess.run(
        [sys.executable, "scripts/gauntlet.py", *args],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=600,
    )


def test_register_and_rate(tiny_c4_run, monkeypatch, tmp_path):
    base, run_dir = tiny_c4_run
    import scripts.gauntlet as g

    monkeypatch.setattr(g, "GAUNTLET", tmp_path / "gauntlet")

    dst = g.register(run_dir, "rA", "latest")
    assert (dst / "model.npz").exists()
    assert (dst / "metadata.json").exists()
    assert not (dst / "optimizer.npz").exists()  # eval-only copy
    info = json.loads((dst / "gauntlet_entry.json").read_text())
    assert info["env"] == "connect_four"
    assert info["step"] >= 96

    g.register(run_dir, "rA_mid", "mid")
    # Explicit step-dir form (no 'best' symlink exists: multiplayer best
    # is rating-driven and this tiny run has no pool).
    from burn_ppo_tpu.checkpoint import CheckpointManager

    first_step = CheckpointManager(run_dir).list_steps()[0]
    g.register(run_dir, "rA_early", f"step_{first_step:08d}")

    result = g.rate("connect_four", players=None, games=2, num_envs=2,
                    seed=0, tag="test")
    names = {row["name"] for row in result["standings"]}
    assert "Random" in names
    assert len(names) == 4
    random_row = next(r for r in result["standings"] if r["name"] == "Random")
    # Random is the anchor at 1000.
    assert random_row["rating"] == 1000.0
    assert (tmp_path / "gauntlet" / "connect_four" / "ratings_test.json").exists()


def test_register_rejects_missing_checkpoint(tmp_path, monkeypatch):
    import scripts.gauntlet as g

    monkeypatch.setattr(g, "GAUNTLET", tmp_path / "gauntlet")
    (tmp_path / "empty_run" / "checkpoints").mkdir(parents=True)
    with pytest.raises(AssertionError):
        g.register(tmp_path / "empty_run", "rX", "latest")
