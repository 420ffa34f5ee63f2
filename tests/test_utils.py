"""Utility coverage: .env loader, stage timings, metrics rendering."""

import os

from tpu_rag.utils.env import env_bool, env_int, load_dotenv
from tpu_rag.utils.metrics import Metrics
from tpu_rag.utils.timing import StageTimings


def test_load_dotenv(tmp_path, monkeypatch):
    p = tmp_path / ".env"
    p.write_text("""
# comment
KEY_A=plain
KEY_B="double quoted"
KEY_C='single quoted'
BROKEN LINE
=nokey
KEY_D=has=equals
""", encoding="utf-8")
    for k in ("KEY_A", "KEY_B", "KEY_C", "KEY_D"):
        monkeypatch.delenv(k, raising=False)
    parsed = load_dotenv(p)
    assert parsed["KEY_A"] == "plain"
    assert parsed["KEY_B"] == "double quoted"
    assert parsed["KEY_C"] == "single quoted"
    assert parsed["KEY_D"] == "has=equals"
    assert os.environ["KEY_A"] == "plain"
    # no-override semantics
    monkeypatch.setenv("KEY_A", "preexisting")
    load_dotenv(p)
    assert os.environ["KEY_A"] == "preexisting"
    load_dotenv(p, override=True)
    assert os.environ["KEY_A"] == "plain"
    # missing file is a no-op
    assert load_dotenv(tmp_path / "nope.env") == {}


def test_env_readers(monkeypatch):
    monkeypatch.setenv("X_INT", "not-a-number")
    assert env_int("X_INT", 7) == 7
    monkeypatch.setenv("X_BOOL", "TRUE")
    assert env_bool("X_BOOL") is True
    monkeypatch.setenv("X_BOOL", "off")
    assert env_bool("X_BOOL", default=True) is False


def test_stage_timings_accumulate():
    t = StageTimings()
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    with t.stage("b"):
        pass
    d = t.as_dict()
    assert set(d) == {"a", "b"}
    assert all(v >= 0 for v in d.values())


def test_metrics_render_format():
    m = Metrics()
    m.inc("reqs_total")
    m.inc("reqs_total", 2)
    with m.timed("op"):
        pass
    text = m.render()
    assert "# TYPE reqs_total counter" in text
    assert "reqs_total 3" in text
    assert "op_seconds_count 1" in text
    assert "op_seconds_sum" in text and "op_seconds_max" in text
