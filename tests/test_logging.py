"""MetricsLogger: JSONL always, MLflow behind an optional import.

The reference logs to TensorBoard + MLflow (utils/misc.py:75-78); mlflow is
absent from this image, so the MLflow path is exercised with a fake module
injected into sys.modules.
"""

import json
import os
import sys
import types

from centroids_reid_tpu.engine.logging import (
    MetricsLogger,
    latest_version_dir,
    next_version_dir,
)


def _make_fake_mlflow(calls):
    m = types.ModuleType("mlflow")

    def rec(name):
        def f(*a, **kw):
            calls.append((name, a, kw))
            return types.SimpleNamespace(info=types.SimpleNamespace(run_id="r0"))
        return f

    for name in ("set_tracking_uri", "set_experiment", "start_run",
                 "log_params", "log_metrics", "end_run"):
        setattr(m, name, rec(name))
    return m


def test_metrics_logger_jsonl_and_mlflow(tmp_path, monkeypatch):
    calls = []
    monkeypatch.setitem(sys.modules, "mlflow", _make_fake_mlflow(calls))
    lg = MetricsLogger(str(tmp_path), "train")
    lg.log_params({"lr": 0.00035, "model": "resnet50"})
    lg.log_metrics({"loss": 1.5, "mAP": 0.9}, step=3)
    lg.close()

    lines = [json.loads(x) for x in
             open(tmp_path / "train" / "metrics.jsonl")]
    assert lines[0]["params"]["model"] == "resnet50"
    assert lines[1]["loss"] == 1.5 and lines[1]["step"] == 3

    names = [c[0] for c in calls]
    assert "set_experiment" in names and "start_run" in names
    assert "log_params" in names and "log_metrics" in names
    assert names[-1] == "end_run"
    logged = [c for c in calls if c[0] == "log_metrics"][0]
    assert logged[1][0]["mAP"] == 0.9 and logged[2]["step"] == 3


def test_metrics_logger_without_mlflow(tmp_path, monkeypatch):
    monkeypatch.setitem(sys.modules, "mlflow", None)  # import raises
    lg = MetricsLogger(str(tmp_path), "train")
    assert lg._mlflow is None
    lg.log_metrics({"loss": 0.5}, step=0)
    lg.close()
    assert os.path.exists(tmp_path / "train" / "metrics.jsonl")


def test_disabled_logger_writes_nothing(tmp_path):
    lg = MetricsLogger(str(tmp_path), "train", enabled=False)
    lg.log_params({"a": 1})
    lg.log_metrics({"loss": 0.5}, step=0)
    lg.close()
    assert not os.path.exists(tmp_path / "train")


def test_version_dirs(tmp_path):
    a = next_version_dir(str(tmp_path), "run")
    b = next_version_dir(str(tmp_path), "run")
    assert a.endswith("version_0") and b.endswith("version_1")
    assert latest_version_dir(str(tmp_path), "run") == b
