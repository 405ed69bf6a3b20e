"""Hardware profiler trace of the flagship skull-CTDE step (VERDICT r3 #5).

Captures a jax.profiler trace of the bench-shape skull window on the
real TPU, then extracts the evidence docs/DESIGN.md's roofline claim
needs: device duty cycle, top-10 ops by self time, and the profiler's
FLOPS utilization — via xprof's xplane converters (no TensorBoard UI).

Usage: python scripts/profile_skull.py [trace_dir]
Prints a markdown summary; leaves the raw trace under trace_dir.
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    import jax
    import jax.numpy as jnp

    trace_dir = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/skull_trace")
    trace_dir.mkdir(parents=True, exist_ok=True)

    os.environ.setdefault("BENCH_SKULL_NUM_ENVS", "4096")
    os.environ.setdefault("BENCH_SKULL_NUM_STEPS", "64")
    os.environ["BENCH_SKULL_ITERS"] = "4"

    from bench import bench_skull_ctde  # noqa: E402 (repo-root import)

    print(f"[profile] platform={jax.default_backend()}", flush=True)

    # bench_skull_ctde compiles + warms; we re-run its timed body under
    # the profiler by tracing a fresh invocation (compile cache is warm).
    with jax.profiler.trace(str(trace_dir)):
        sps, flops, _ = bench_skull_ctde(jax, jnp)
    print(f"[profile] traced: {sps/1e6:.2f}M sps", flush=True)

    xplanes = sorted(trace_dir.rglob("*.xplane.pb"))
    if not xplanes:
        print("[profile] NO xplane produced — tunnel cannot trace device")
        return 1
    xplane = str(xplanes[-1])
    print(f"[profile] xplane: {xplane}", flush=True)

    from xprof.convert import raw_to_tool_data as rtd

    tools = rtd.xspace_to_tool_names([xplane])
    print(f"[profile] tools available: {tools}", flush=True)

    out = {}
    for tool in ("overview_page", "framework_op_stats", "op_profile"):
        if tool not in tools and f"{tool}^" not in tools:
            continue
        try:
            data, _ = rtd.xspace_to_tool_data([xplane], f"{tool}^", {})
            out[tool] = data
        except Exception as e:  # noqa: BLE001
            print(f"[profile] {tool} failed: {e}")

    summary_path = trace_dir / "summary.json"

    report = {}
    if "framework_op_stats" in out:
        data = out["framework_op_stats"]
        if isinstance(data, (bytes, str)):
            try:
                stats = json.loads(data)
            except Exception:
                stats = None
        else:
            stats = data
        report["framework_op_stats_raw"] = True
        # Emit the raw table head for manual digestion if json parse fails
        if stats is None and isinstance(data, (bytes, str)):
            txt = data.decode() if isinstance(data, bytes) else data
            (trace_dir / "framework_op_stats.csv").write_text(txt)

    for tool, data in out.items():
        p = trace_dir / f"{tool}.out"
        if isinstance(data, bytes):
            p.write_bytes(data)
        else:
            p.write_text(data if isinstance(data, str) else json.dumps(data))
        print(f"[profile] wrote {p}")

    summary_path.write_text(json.dumps(report, indent=2))
    print(f"[profile] sps={sps/1e6:.2f}M analytic_tflops={flops/1e12:.2f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
