"""Stream runs/*/metrics.jsonl into an Aim server.

Parity with the reference bridge (scripts/aim_watcher.py): watches every
run directory under a base dir, tails each ``metrics.jsonl`` from a
persisted byte offset (``.aim_offset``), reuses the Aim run hash across
restarts (``.aim_run_hash``), and closes idle runs LRU-style so the
watcher can track many runs with bounded Aim handles.

Requires the ``aim`` package (not bundled); exits with a clear message
if unavailable. The JSONL format is shared with the reference, so this
watcher works on either framework's runs.

Usage: python scripts/aim_watcher.py [runs_dir] [--repo AIM_REPO]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

try:
    from aim import Run  # type: ignore
except ImportError:
    Run = None

MAX_OPEN_RUNS = 8
POLL_INTERVAL = 2.0


class RunTracker:
    """Tails one run's metrics.jsonl into one Aim Run."""

    def __init__(self, run_dir: Path, repo: str | None):
        self.run_dir = run_dir
        self.metrics_path = run_dir / "metrics.jsonl"
        self.offset_path = run_dir / ".aim_offset"
        self.hash_path = run_dir / ".aim_run_hash"
        self.repo = repo
        self.offset = 0
        if self.offset_path.exists():
            try:
                self.offset = int(self.offset_path.read_text().strip())
            except ValueError:
                self.offset = 0
        self.run = None
        self.last_activity = time.time()

    def _open_run(self):
        if self.run is not None:
            return
        kwargs = {"repo": self.repo} if self.repo else {}
        if self.hash_path.exists():
            run_hash = self.hash_path.read_text().strip()
            try:
                self.run = Run(run_hash=run_hash, **kwargs)
            except Exception:
                self.run = Run(experiment=self.run_dir.name, **kwargs)
        else:
            self.run = Run(experiment=self.run_dir.name, **kwargs)
        self.hash_path.write_text(self.run.hash)
        self.run.name = self.run_dir.name

    def poll(self) -> int:
        """Read new lines; returns number of rows ingested."""
        if not self.metrics_path.exists():
            return 0
        size = self.metrics_path.stat().st_size
        if size <= self.offset:
            if size < self.offset:  # truncated/rewritten: restart
                self.offset = 0
            else:
                return 0
        count = 0
        # Binary mode: offsets must count FILE bytes. Text mode's
        # universal-newline translation collapses \r\n to \n, making
        # len(line.encode()) undercount and the persisted offset drift
        # backwards into already-ingested data.
        with open(self.metrics_path, "rb") as f:
            f.seek(self.offset)
            for raw in f:
                if not raw.endswith(b"\n"):
                    break  # partial write; retry next poll
                self.offset += len(raw)
                line = raw.decode("utf-8", errors="replace").strip()
                if not line:
                    continue
                try:
                    row = json.loads(line)
                except json.JSONDecodeError:
                    continue
                self._open_run()
                if row.get("type") == "hparams":
                    self.run["hparams"] = row.get("data", {})
                elif row.get("type") == "scalar":
                    # null = non-finite at log time (serde_json parity);
                    # nothing plottable, skip the point.
                    if row.get("value") is not None:
                        self.run.track(
                            row["value"], name=row["name"], step=row["step"]
                        )
                count += 1
        if count:
            self.offset_path.write_text(str(self.offset))
            self.last_activity = time.time()
        return count

    def close(self):
        if self.run is not None:
            self.run.close()
            self.run = None


class RunManager:
    def __init__(self, base_dir: Path, repo: str | None):
        self.base_dir = base_dir
        self.repo = repo
        self.trackers: dict[str, RunTracker] = {}

    def scan(self):
        if not self.base_dir.exists():
            return
        for run_dir in self.base_dir.iterdir():
            if run_dir.is_dir() and (run_dir / "metrics.jsonl").exists():
                if run_dir.name not in self.trackers:
                    print(f"watching {run_dir}")
                    self.trackers[run_dir.name] = RunTracker(run_dir, self.repo)

    def evict_idle(self):
        open_runs = [t for t in self.trackers.values() if t.run is not None]
        if len(open_runs) <= MAX_OPEN_RUNS:
            return
        open_runs.sort(key=lambda t: t.last_activity)
        for t in open_runs[: len(open_runs) - MAX_OPEN_RUNS]:
            print(f"closing idle run {t.run_dir.name}")
            t.close()

    def loop(self):
        while True:
            self.scan()
            total = sum(t.poll() for t in self.trackers.values())
            self.evict_idle()
            time.sleep(POLL_INTERVAL if total == 0 else 0.1)


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("runs_dir", nargs="?", default="runs")
    parser.add_argument("--repo", default=None, help="Aim repo path/URL")
    args = parser.parse_args()
    if Run is None:
        print(
            "error: the 'aim' package is not installed; metrics remain "
            "available as JSONL under the run directory",
            file=sys.stderr,
        )
        return 1
    RunManager(Path(args.runs_dir), args.repo).loop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
