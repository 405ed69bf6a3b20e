"""Profiling subsystem tests (reference src/profile.rs analog)."""

import json

from burn_ppo_tpu.profile import (
    REGISTRY,
    ScopeRegistry,
    ScopeStats,
    device_memory_stats,
    profile_scope,
    profiled,
    write_scope_report,
)


def test_scope_stats_record():
    s = ScopeStats()
    s.record(0.1)
    s.record(0.3)
    assert s.count == 2
    assert abs(s.total_seconds - 0.4) < 1e-9
    assert abs(s.max_seconds - 0.3) < 1e-9
    assert abs(s.mean_seconds - 0.2) < 1e-9


def test_profile_scope_records():
    reg = ScopeRegistry()
    import burn_ppo_tpu.profile as prof

    old = prof.REGISTRY
    prof.REGISTRY = reg
    try:
        with profile_scope("zone_a"):
            pass
        with profile_scope("zone_a"):
            pass
        snap = reg.snapshot()
        assert snap["zone_a"].count == 2
        assert snap["zone_a"].total_seconds >= 0.0
    finally:
        prof.REGISTRY = old


def test_profiled_decorator():
    reg = ScopeRegistry()
    import burn_ppo_tpu.profile as prof

    old = prof.REGISTRY
    prof.REGISTRY = reg
    try:

        @profiled("my_fn")
        def f(x):
            return x + 1

        assert f(1) == 2
        assert reg.snapshot()["my_fn"].count == 1
    finally:
        prof.REGISTRY = old


def test_registry_report_and_reset():
    reg = ScopeRegistry()
    reg.record("a", 0.5)
    reg.record("b", 0.1)
    report = reg.report()
    assert "a" in report and "b" in report
    # sorted by total desc: a before b
    assert report.index("a") < report.index("b")
    reg.reset()
    assert reg.snapshot() == {}


def test_device_memory_stats_shape():
    stats = device_memory_stats()
    assert len(stats) >= 1
    assert "device" in stats[0]
    assert "bytes_in_use" in stats[0]


def test_write_scope_report(tmp_path):
    reg = ScopeRegistry()
    import burn_ppo_tpu.profile as prof

    old = prof.REGISTRY
    prof.REGISTRY = reg
    try:
        reg.record("zone", 0.25)
        out = tmp_path / "profile.json"
        write_scope_report(out)
        data = json.loads(out.read_text())
        assert data["zone"]["count"] == 1
        assert abs(data["zone"]["total_seconds"] - 0.25) < 1e-9
    finally:
        prof.REGISTRY = old


def test_trace_capture_window(tmp_path, monkeypatch):
    """TraceCapture starts at start_update and stops after the window."""
    from burn_ppo_tpu import profile as prof

    calls = []

    class FakeProfiler:
        @staticmethod
        def start_trace(d):
            calls.append(("start", d))

        @staticmethod
        def stop_trace():
            calls.append(("stop", None))

    import jax

    monkeypatch.setattr(jax, "profiler", FakeProfiler)
    cap = prof.TraceCapture(tmp_path / "tr", start_update=2, num_updates=2)
    for i in range(1, 5):
        cap.on_update_start(i)
        cap.on_update_end(i)
    assert [c[0] for c in calls] == ["start", "stop"]
    assert cap._done
    # close() after done is a no-op
    cap.close()
    assert [c[0] for c in calls] == ["start", "stop"]


def _fake_profiler(monkeypatch, calls):
    import jax

    class FakeProfiler:
        @staticmethod
        def start_trace(d):
            calls.append(("start", d))

        @staticmethod
        def stop_trace():
            calls.append(("stop", None))

    monkeypatch.setattr(jax, "profiler", FakeProfiler)


def test_trace_capture_resumed_run_gets_full_window(tmp_path, monkeypatch):
    """On a resumed run the first update index may be far past
    start_update; the window must count from the ACTUAL start, not the
    configured one (else it stops after 1 update)."""
    from burn_ppo_tpu import profile as prof

    calls = []
    _fake_profiler(monkeypatch, calls)
    cap = prof.TraceCapture(tmp_path / "tr", start_update=10, num_updates=3)
    stops_at = None
    for i in range(100, 106):
        cap.on_update_start(i)
        cap.on_update_end(i)
        if calls and calls[-1][0] == "stop" and stops_at is None:
            stops_at = i
    assert [c[0] for c in calls] == ["start", "stop"]
    assert stops_at == 102  # updates 100,101,102 captured = num_updates


def test_trace_capture_zero_updates_captures_nothing(tmp_path, monkeypatch):
    from burn_ppo_tpu import profile as prof

    calls = []
    _fake_profiler(monkeypatch, calls)
    cap = prof.TraceCapture(tmp_path / "tr", start_update=1, num_updates=0)
    for i in range(1, 4):
        cap.on_update_start(i)
        cap.on_update_end(i)
    assert calls == []
    assert cap._done
