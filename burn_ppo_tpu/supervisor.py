"""Training supervisor: subprocess respawn every N checkpoints.

Parity with the reference (src/supervisor.rs): the parent respawns the
training run as a child process every ``reload_every_n_checkpoints``
checkpoint saves — the reference's mitigation for long-run memory
growth. The first child starts fresh (or resumes what the user asked
for); subsequent children pass ``--resume`` on the run directory with an
``--elapsed-time-offset-ms`` carry-over; completion is detected from the
latest checkpoint's metadata step (supervisor.rs:102-260).

Under JAX a leak-driven restart is rarely necessary, but the mechanism
doubles as generic crash/preemption resilience: any child exit short of
completion resumes from ``checkpoints/latest``.
"""

from __future__ import annotations

import json
import signal
import subprocess
import sys
import time
from pathlib import Path
from typing import List, Optional


class TrainingSupervisor:
    def __init__(
        self,
        run_dir: str | Path,
        child_args: List[str],
        *,
        reload_every_n_checkpoints: int,
        total_steps: int,
        max_restarts: int = 1000,
        quiet: bool = False,
    ):
        self.run_dir = Path(run_dir)
        self.child_args = child_args
        self.n = reload_every_n_checkpoints
        self.total_steps = total_steps
        self.max_restarts = max_restarts
        self.quiet = quiet

    def latest_step(self) -> Optional[int]:
        latest = self.run_dir / "checkpoints" / "latest"
        meta = latest / "metadata.json"
        if not meta.exists():
            return None
        try:
            return int(json.loads(meta.read_text())["step"])
        except (ValueError, KeyError, json.JSONDecodeError):
            return None

    def is_training_complete(self) -> bool:
        step = self.latest_step()
        return step is not None and step >= self.total_steps

    def run(self) -> int:
        """Spawn-and-wait loop (supervisor.rs:102-153)."""
        start = time.time()
        first = True
        for restart in range(self.max_restarts):
            if self.is_training_complete():
                if not self.quiet:
                    print(f"supervisor: training complete at step {self.latest_step()}")
                return 0

            elapsed_ms = int((time.time() - start) * 1000)
            args = list(self.child_args)
            if not first or self.latest_step() is not None:
                # Resume from the run dir; drop any fresh-start config arg
                # conflicts are handled by the resume-override policy.
                if "--resume" not in args:
                    args += ["--resume", str(self.run_dir)]
            args += [
                "--max-checkpoints-this-run", str(self.n),
                "--elapsed-time-offset-ms", str(elapsed_ms),
            ]
            cmd = [sys.executable, "-m", "burn_ppo_tpu", "train", *args]
            if not self.quiet:
                print(f"supervisor: spawn #{restart + 1}: {' '.join(cmd)}")
            proc = subprocess.Popen(cmd)
            try:
                rc = proc.wait()
            except KeyboardInterrupt:
                proc.send_signal(signal.SIGINT)
                try:
                    proc.wait(timeout=60)
                except subprocess.TimeoutExpired:
                    proc.kill()
                return 130
            if rc != 0:
                if not self.quiet:
                    print(f"supervisor: child exited rc={rc}; retrying from latest")
            first = False
        print("supervisor: max restarts exceeded")
        return 1
