"""Hardware profiler trace of the flagship skull-CTDE step (VERDICT r3 #5).

Captures a jax.profiler trace of the bench-shape skull window on the
real TPU, then extracts the evidence docs/DESIGN.md's roofline claim
needs: device duty cycle, top-10 ops by self time, and the profiler's
FLOPS utilization — via xprof's xplane converters (no TensorBoard UI).

Usage: python scripts/profile_skull.py [trace_dir] [--bf16]
Prints a markdown summary; leaves the raw trace under trace_dir.
``--bf16`` traces the compute_dtype=bfloat16 variant (the r5 f32-vs-bf16
roofline reconciliation, VERDICT r4 weak #3).
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

    args = [a for a in sys.argv[1:] if a != "--bf16"]
    dtype = "bfloat16" if "--bf16" in sys.argv[1:] else None
    trace_dir = Path(args[0] if args else "/tmp/skull_trace")
    trace_dir.mkdir(parents=True, exist_ok=True)

    os.environ.setdefault("BENCH_SKULL_NUM_ENVS", "4096")
    os.environ.setdefault("BENCH_SKULL_NUM_STEPS", "64")
    os.environ["BENCH_SKULL_ITERS"] = "4"

    from bench import bench_skull_ctde  # noqa: E402 (repo-root import)

    print(
        f"[profile] platform={jax.default_backend()}"
        f" dtype={dtype or 'float32'}",
        flush=True,
    )

    # bench_skull_ctde compiles + warms; we re-run its timed body under
    # the profiler by tracing a fresh invocation (compile cache is warm).
    with jax.profiler.trace(str(trace_dir)):
        sps, flops, _ = bench_skull_ctde(jax, jnp, compute_dtype=dtype)
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
    # hlo_stats first and every tool written to disk IMMEDIATELY after
    # converting: the overview_page converter can hard-crash the process
    # (not an exception — an abort), which must not lose the tools that
    # already converted.
    for tool in (
        "hlo_stats", "framework_op_stats", "op_profile", "roofline_model",
        "overview_page",
    ):
        if tool not in tools and f"{tool}^" not in tools:
            continue
        try:
            data, _ = rtd.xspace_to_tool_data([xplane], f"{tool}^", {})
            out[tool] = data
        except Exception as e:  # noqa: BLE001
            print(f"[profile] {tool} failed: {e}")
            continue
        p = trace_dir / f"{tool}.out"
        if isinstance(data, bytes):
            p.write_bytes(data)
        else:
            p.write_text(data if isinstance(data, str) else json.dumps(data))
        print(f"[profile] wrote {p}", flush=True)

    _summarize(out)
    print(f"[profile] sps={sps/1e6:.2f}M analytic_tflops={flops/1e12:.2f}")
    return 0


def _rows_from_gviz(data):
    """gviz-style {'cols': [...], 'rows': [{'c': [{'v': ...}]}]} or a
    plain list of dicts -> (headers, rows)."""
    if isinstance(data, (bytes, str)):
        try:
            data = json.loads(data)
        except Exception:
            return None, None
    if isinstance(data, dict) and "cols" in data and "rows" in data:
        headers = [c.get("label") or c.get("id") for c in data["cols"]]
        rows = [
            [None if c is None else c.get("v") for c in r.get("c", [])]
            for r in data["rows"]
        ]
        return headers, rows
    if isinstance(data, list) and data and isinstance(data[0], dict):
        headers = list(data[0])
        return headers, [[r.get(h) for h in headers] for r in data]
    return None, None


def _summarize(out) -> None:
    """Top-ops table + device duty cycle from whatever tools returned."""
    for tool in ("hlo_stats", "framework_op_stats"):
        headers, rows = _rows_from_gviz(out.get(tool))
        if not headers or not rows:
            continue
        # Rank by SELF time — total time makes the outer `while` (the
        # whole fused program) rank first and hides everything else.
        time_cols = [
            i for i, h in enumerate(headers)
            if h and "time" in str(h).lower() and "%" not in str(h)
        ]
        if not time_cols:
            continue
        tc = next(
            (i for i in time_cols if "self" in str(headers[i]).lower()
             and "avg" not in str(headers[i]).lower()),
            time_cols[0],
        )
        num = [r for r in rows if isinstance(r[tc], (int, float))]
        total = sum(r[tc] for r in num) or 1.0
        ranked = sorted(num, key=lambda r: -r[tc])[:10]
        print(f"\n[profile] top-10 by {headers[tc]} ({tool}):")
        name_col = next(
            (i for i, h in enumerate(headers)
             if h and "name" in str(h).lower()),
            next(
                (i for i, h in enumerate(headers)
                 if h and "op" in str(h).lower()),
                0,
            ),
        )
        cat_col = next(
            (i for i, h in enumerate(headers)
             if h and "category" in str(h).lower()),
            None,
        )
        for r in ranked:
            cat = f" [{r[cat_col]}]" if cat_col is not None else ""
            print(
                f"  {100 * r[tc] / total:5.1f}% {r[tc]:>12}"
                f" {str(r[name_col])[:70]}{cat}"
            )
        # Category rollup + trace-measured achieved FLOP rate.
        ix = {str(h): i for i, h in enumerate(headers)}
        gcol = ix.get("Model GFLOP/s")
        ccol = ix.get("HLO op category")
        if gcol is not None:
            gflop = sum(
                r[tc] * 1e-6 * float(r[gcol] or 0)
                for r in num if r[gcol] is not None
            )
            print(
                f"[profile] trace achieved rate over busy time: "
                f"{gflop / (total * 1e-6) / 1e3:.1f} TFLOP/s"
            )
        if ccol is not None:
            cats = {}
            for r in num:
                cats[r[ccol]] = cats.get(r[ccol], 0.0) + r[tc]
            print("[profile] by category:")
            for c, t in sorted(cats.items(), key=lambda kv: -kv[1])[:8]:
                print(f"  {100 * t / total:5.1f}% {t / 1e3:9.1f}ms {c}")
        break
    ov = out.get("overview_page")
    if isinstance(ov, (bytes, str)):
        try:
            ov = json.loads(ov)
        except Exception:
            ov = None
    if isinstance(ov, dict):
        flat = json.dumps(ov)
        for key in ("flop_rate_utilization", "mxu_utilization",
                    "device_duty_cycle", "idle"):
            if key in flat:
                print(f"[profile] overview contains '{key}'")


if __name__ == "__main__":
    sys.exit(main())
