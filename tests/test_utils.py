"""Task utilities (use_tpu/utils/utils.py): tag enforcement, crash-safe
wrapper, metric retrieval, RTF. Reference behavior: src/utils/utils.py and
src/utils/rich_utils.py.
"""
import pytest

from use_tpu.utils.utils import (
    enforce_tags,
    get_metric_value,
    rtf,
    task_wrapper,
)


def test_enforce_tags_defaults_and_saves(tmp_path):
    cfg = {}
    save = str(tmp_path / "tags.log")
    enforce_tags(cfg, save_to=save)
    assert cfg["tags"] == ["dev"]
    cfg2 = {"tags": ["exp1", "ablate"]}
    enforce_tags(cfg2, save_to=save)
    assert cfg2["tags"] == ["exp1", "ablate"]
    lines = open(save).read().splitlines()
    assert lines == ["dev", "exp1 ablate"]


def test_task_wrapper_reraises():
    calls = []

    @task_wrapper
    def boom():
        calls.append(1)
        raise ValueError("nope")

    with pytest.raises(ValueError):
        boom()
    assert calls == [1]

    @task_wrapper
    def ok():
        return 42

    assert ok() == 42


def test_get_metric_value():
    metrics = {"val/loss": 0.5}
    assert get_metric_value(metrics, "val/loss") == 0.5
    assert get_metric_value(metrics, None) is None
    with pytest.raises(KeyError):
        get_metric_value(metrics, "val/missing")


def test_rtf():
    # 2 s of wall for 4 s of audio -> 0.5x real time factor
    assert rtf(2.0, 4 * 24000, 24000) == pytest.approx(0.5)


def test_metric_logger_zoo(tmp_path, monkeypatch):
    """Full logger-zoo multiplexing (reference configs/logger/*.yaml):
    csv always; comet/mlflow/neptune/aim via injected fake modules; missing
    backends skip gracefully."""
    import sys
    import types

    from use_tpu.utils.logging import MetricLogger

    events = {"comet": [], "mlflow": [], "neptune": [], "aim": []}

    comet = types.ModuleType("comet_ml")

    class _Comet:
        def __init__(self, project_name):
            events["comet"].append(("init", project_name))

        def log_metrics(self, scalars, step):
            events["comet"].append(("log", dict(scalars), step))

        def end(self):
            events["comet"].append(("end",))

    comet.Experiment = _Comet

    mlflow = types.ModuleType("mlflow")
    mlflow.set_tracking_uri = lambda uri: events["mlflow"].append(("uri", uri))
    mlflow.set_experiment = lambda e: events["mlflow"].append(("exp", e))
    mlflow.start_run = lambda: events["mlflow"].append(("start",))
    mlflow.log_metrics = lambda m, step: events["mlflow"].append(("log", m, step))
    mlflow.end_run = lambda: events["mlflow"].append(("end",))

    neptune = types.ModuleType("neptune")

    class _NeptuneSeries:
        def __init__(self, key):
            self.key = key

        def append(self, v, step):
            events["neptune"].append(("log", self.key, v, step))

    class _NeptuneRun:
        def __getitem__(self, key):
            return _NeptuneSeries(key)

        def stop(self):
            events["neptune"].append(("stop",))

    neptune.init_run = lambda project: _NeptuneRun()

    aim = types.ModuleType("aim")

    class _AimRun:
        def __init__(self, repo):
            events["aim"].append(("init", repo))

        def track(self, v, name, step):
            events["aim"].append(("log", name, v, step))

        def close(self):
            events["aim"].append(("close",))

    aim.Run = _AimRun

    for name, mod in [
        ("comet_ml", comet), ("mlflow", mlflow), ("neptune", neptune), ("aim", aim)
    ]:
        monkeypatch.setitem(sys.modules, name, mod)

    csv_path = str(tmp_path / "metrics.csv")
    logger = MetricLogger(
        csv_path=csv_path,
        comet_project="proj",
        mlflow_uri="file:///tmp/mlruns",
        mlflow_experiment="exp",
        neptune_project="ws/proj",
        aim_repo=str(tmp_path),
        # wandb is absent from the environment: must skip gracefully
        wandb_project="proj",
    )
    logger.log({"epoch": 3, "val/loss": 0.25, "name": "run"})
    logger.close()

    assert ("log", {"epoch": 3, "val/loss": 0.25}, 3) in events["comet"]
    assert ("log", {"epoch": 3.0, "val_loss": 0.25}, 3) in events["mlflow"]
    assert ("log", "val/loss", 0.25, 3) in events["neptune"]
    assert ("log", "val/loss", 0.25, 3) in events["aim"]
    assert ("end",) in events["comet"] and ("end",) in events["mlflow"]
    header, row = open(csv_path).read().splitlines()
    assert header == "epoch,val/loss,name" and row == "3,0.25,run"
