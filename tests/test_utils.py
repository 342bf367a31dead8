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
