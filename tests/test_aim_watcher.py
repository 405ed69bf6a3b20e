"""Aim watcher tests with a fake Aim Run (the aim package isn't bundled;
reference scripts/aim_watcher.py behavior: offset resume, run-hash
persistence, partial-line handling, idle-run LRU eviction)."""

import importlib.util
import json
import sys
import types
from pathlib import Path

import pytest

SCRIPT = Path(__file__).resolve().parent.parent / "scripts" / "aim_watcher.py"


class FakeRun:
    instances = []

    def __init__(self, run_hash=None, experiment=None, repo=None):
        if run_hash is not None and not run_hash.startswith("h-"):
            raise ValueError("unknown hash")
        self.hash = run_hash or f"h-{len(FakeRun.instances)}"
        self.experiment = experiment
        self.tracked = []
        self.params = {}
        self.closed = False
        self.name = None
        FakeRun.instances.append(self)

    def track(self, value, name=None, step=None):
        self.tracked.append((name, value, step))

    def __setitem__(self, key, value):
        self.params[key] = value

    def close(self):
        self.closed = True


@pytest.fixture()
def watcher(monkeypatch):
    spec = importlib.util.spec_from_file_location("aim_watcher_test", SCRIPT)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.Run = FakeRun
    FakeRun.instances = []
    return mod


def write_metrics(run_dir: Path, rows):
    run_dir.mkdir(parents=True, exist_ok=True)
    with open(run_dir / "metrics.jsonl", "a") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")


def test_poll_ingests_rows(watcher, tmp_path):
    run = tmp_path / "r1"
    write_metrics(run, [
        {"type": "hparams", "step": 0, "data": {"env": "cartpole"}},
        {"type": "scalar", "step": 10, "name": "train/loss", "value": 0.5},
    ])
    t = watcher.RunTracker(run, None)
    assert t.poll() == 2
    fr = FakeRun.instances[-1]
    assert fr.params["hparams"] == {"env": "cartpole"}
    assert fr.tracked == [("train/loss", 0.5, 10)]


def test_offset_persisted_and_resumed(watcher, tmp_path):
    run = tmp_path / "r1"
    write_metrics(run, [{"type": "scalar", "step": 1, "name": "a", "value": 1.0}])
    t = watcher.RunTracker(run, None)
    assert t.poll() == 1
    offset = int((run / ".aim_offset").read_text())
    assert offset > 0
    # a new tracker resumes from the offset: no double ingestion
    write_metrics(run, [{"type": "scalar", "step": 2, "name": "a", "value": 2.0}])
    t2 = watcher.RunTracker(run, None)
    assert t2.poll() == 1
    assert FakeRun.instances[-1].tracked == [("a", 2.0, 2)]


def test_run_hash_reused(watcher, tmp_path):
    run = tmp_path / "r1"
    write_metrics(run, [{"type": "scalar", "step": 1, "name": "a", "value": 1.0}])
    t = watcher.RunTracker(run, None)
    t.poll()
    h = (run / ".aim_run_hash").read_text()
    write_metrics(run, [{"type": "scalar", "step": 2, "name": "a", "value": 2.0}])
    t2 = watcher.RunTracker(run, None)
    t2.poll()
    assert FakeRun.instances[-1].hash == h


def test_partial_line_deferred(watcher, tmp_path):
    run = tmp_path / "r1"
    run.mkdir()
    with open(run / "metrics.jsonl", "w") as f:
        f.write(json.dumps({"type": "scalar", "step": 1, "name": "a", "value": 1.0}) + "\n")
        f.write('{"type": "scalar", "step": 2, "name":')  # partial write
    t = watcher.RunTracker(run, None)
    assert t.poll() == 1
    with open(run / "metrics.jsonl", "a") as f:
        f.write(' "a", "value": 2.0}\n')
    assert t.poll() == 1
    # both rows ingested exactly once, in order
    assert [x[2] for x in FakeRun.instances[-1].tracked] == [1, 2]


def test_truncated_file_restarts(watcher, tmp_path):
    run = tmp_path / "r1"
    write_metrics(
        run,
        [{"type": "scalar", "step": 1, "name": "a_long_series_name", "value": 1.0}],
    )
    t = watcher.RunTracker(run, None)
    t.poll()
    (run / "metrics.jsonl").write_text("")  # truncated/rewritten
    # Truncation detection is size-based (smaller file => restart from 0),
    # matching the reference's offset-file semantics.
    write_metrics(run, [{"type": "scalar", "step": 9, "name": "b", "value": 3.0}])
    assert t.poll() == 1


def test_corrupt_lines_skipped(watcher, tmp_path):
    run = tmp_path / "r1"
    run.mkdir()
    with open(run / "metrics.jsonl", "w") as f:
        f.write("not json\n")
        f.write(json.dumps({"type": "scalar", "step": 1, "name": "a", "value": 1.0}) + "\n")
    t = watcher.RunTracker(run, None)
    assert t.poll() == 1


def test_manager_scan_and_eviction(watcher, tmp_path, monkeypatch):
    monkeypatch.setattr(watcher, "MAX_OPEN_RUNS", 2)
    for i in range(4):
        write_metrics(
            tmp_path / f"run{i}",
            [{"type": "scalar", "step": 1, "name": "a", "value": float(i)}],
        )
    mgr = watcher.RunManager(tmp_path, None)
    mgr.scan()
    assert len(mgr.trackers) == 4
    for t in mgr.trackers.values():
        t.poll()
    mgr.evict_idle()
    open_now = [t for t in mgr.trackers.values() if t.run is not None]
    assert len(open_now) == 2
