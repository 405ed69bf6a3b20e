"""Host-side bench.py helpers (no device work): baseline merging and
iteration-count clamping."""

import json
import sys

sys.path.insert(0, ".")  # bench.py lives at the repo root

import bench


def test_previous_bench_merges_per_metric(tmp_path, monkeypatch):
    """A metric missing (or zero) in the latest round must fall back to
    the most recent round that HAS it, per metric — not be masked by the
    newest file wholesale."""
    (tmp_path / "BENCH_r01.json").write_text(json.dumps({
        "value": 100.0,
        "extra": {"selfplay_pool_sps": 5.0, "skull_ctde_sps": 2.0},
    }))
    (tmp_path / "BENCH_r02.json").write_text(json.dumps({
        "parsed": {"value": 110.0, "extra": {"selfplay_pool_sps": 6.0}},
    }))
    monkeypatch.chdir(tmp_path)
    prev = bench.previous_bench()
    assert prev["value"] == 110.0  # latest round wins where present
    assert prev["extra"]["selfplay_pool_sps"] == 6.0
    assert prev["extra"]["skull_ctde_sps"] == 2.0  # falls back to r01


def test_previous_bench_numeric_round_order(tmp_path, monkeypatch):
    """BENCH_r10 must beat BENCH_r9 (lexicographic order would not)."""
    (tmp_path / "BENCH_r9.json").write_text(json.dumps({"value": 9.0}))
    (tmp_path / "BENCH_r10.json").write_text(json.dumps({"value": 10.0}))
    monkeypatch.chdir(tmp_path)
    assert bench.previous_bench()["value"] == 10.0


def test_previous_bench_skips_garbage(tmp_path, monkeypatch):
    (tmp_path / "BENCH_r01.json").write_text("{not json")
    (tmp_path / "BENCH_r02.json").write_text(json.dumps({
        "value": "nan?", "extra": {"x": None, "y": 3.0},
    }))
    monkeypatch.chdir(tmp_path)
    prev = bench.previous_bench()
    assert prev["value"] == 0.0
    assert prev["extra"] == {"y": 3.0}


def test_iters_env_clamps_to_two(monkeypatch, capsys):
    """iters=1 degenerates the (dt_N - dt_1)/(iters-1) differencing into
    a ~1e20 env-steps/s headline; the parser must clamp to 2."""
    monkeypatch.setenv("BENCH_ITERS", "1")
    assert bench._iters_env("BENCH_ITERS", "100") == 2
    assert "clamping" in capsys.readouterr().err
    monkeypatch.setenv("BENCH_ITERS", "50")
    assert bench._iters_env("BENCH_ITERS", "100") == 50
    monkeypatch.delenv("BENCH_ITERS")
    assert bench._iters_env("BENCH_ITERS", "100") == 100
