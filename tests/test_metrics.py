"""Metrics logger tests (reference src/metrics.rs: JSONL row formats)."""

import json


from burn_ppo_tpu.metrics import MetricsLogger


def read_rows(run_dir):
    path = run_dir / "metrics.jsonl"
    return [json.loads(line) for line in path.read_text().splitlines()]


def test_scalar_row_format(tmp_path):
    m = MetricsLogger(tmp_path)
    m.log_scalar("train/policy_loss", 0.5, 128)
    m.flush()
    rows = read_rows(tmp_path)
    assert rows == [
        {"type": "scalar", "step": 128, "name": "train/policy_loss", "value": 0.5}
    ]


def test_hparams_row_format(tmp_path):
    m = MetricsLogger(tmp_path)
    m.log_hparams({"env": "cartpole", "num_envs": 32}, step=0)
    m.flush()
    rows = read_rows(tmp_path)
    assert rows[0]["type"] == "hparams"
    assert rows[0]["step"] == 0
    assert rows[0]["data"]["env"] == "cartpole"


def test_nan_inf_written_as_null(tmp_path):
    """Non-finite values serialize as null (serde_json parity) — NOT 0.0,
    which would make a diverged run read as converged."""
    m = MetricsLogger(tmp_path)
    m.log_scalar("a", float("nan"), 1)
    m.log_scalar("b", float("inf"), 1)
    m.flush()
    rows = read_rows(tmp_path)
    assert rows[0]["value"] is None and rows[1]["value"] is None


def test_append_only_across_instances(tmp_path):
    MetricsLogger(tmp_path).log_scalar("x", 1.0, 1)
    m2 = MetricsLogger(tmp_path)
    m2.log_scalar("x", 2.0, 2)
    m2.flush()
    rows = read_rows(tmp_path)
    assert [r["value"] for r in rows] == [1.0, 2.0]


def test_log_scalars_batch(tmp_path):
    m = MetricsLogger(tmp_path)
    m.log_scalars({"a": 1.0, "b": 2.0}, 7)
    m.flush()
    rows = read_rows(tmp_path)
    assert {r["name"] for r in rows} == {"a", "b"}
    assert all(r["step"] == 7 for r in rows)


def test_hparams_nonjson_values_stringified(tmp_path):
    m = MetricsLogger(tmp_path)
    m.log_hparams({"sched": [[0.1, 0], [0.0, 100]], "obj": object()})
    m.flush()
    row = read_rows(tmp_path)[0]
    assert row["data"]["sched"] == [[0.1, 0], [0.0, 100]]
    assert isinstance(row["data"]["obj"], str)


def test_hparams_nonfinite_floats_written_as_null(tmp_path):
    """json.dumps would emit bare NaN/Infinity (invalid JSON); serde_json
    — the reference's serializer — emits null. A strict consumer must be
    able to parse every line."""
    import math

    from burn_ppo_tpu.metrics import MetricsLogger

    log = MetricsLogger(tmp_path)
    log.log_hparams(
        {"lr": 1e-3, "target_kl": math.inf, "bad": math.nan,
         "nested": {"v": -math.inf, "list": [1.0, math.nan]}}
    )
    log.close()
    line = (tmp_path / "metrics.jsonl").read_text().splitlines()[0]
    data = json.loads(line)["data"]  # must parse as strict JSON
    assert data["lr"] == 1e-3
    assert data["target_kl"] is None
    assert data["bad"] is None
    assert data["nested"]["v"] is None
    assert data["nested"]["list"] == [1.0, None]
