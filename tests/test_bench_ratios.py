"""bench.py's standing regression ledger (_ratio_report): the computed
artifact the round relies on must compute medians/ratios correctly and
tolerate registry growth and retirement (VERDICT r8 item 1)."""

import importlib.util
import json
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture()
def bench_mod():
    spec = importlib.util.spec_from_file_location("bench", REPO / "bench.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_ratio_report_math_and_artifact(bench_mod, monkeypatch, tmp_path):
    base = {"a": {"min": 1.0}, "b": {"min": 2.0}, "gone": {"min": 1.0}}
    (tmp_path / "BASE.json").write_text(json.dumps(base))
    # point the reporter at a scratch base and scratch output location
    monkeypatch.setenv("SPARK_GRAFT_BENCH_BASE", "BASE.json")
    monkeypatch.setattr(
        bench_mod, "__file__", str(tmp_path / "bench.py"), raising=False
    )
    timings = {"a": 1.0, "b": 3.2, "new": 0.5}
    out = bench_mod._ratio_report(timings)
    assert out["carried_median_vs_base"] == pytest.approx(1.3, abs=1e-9)
    assert out["over_1_5x_count"] == 1
    rep = json.loads((tmp_path / "BENCH_RATIOS.json").read_text())
    assert rep["over_1_5x"] == {
        "b": {"base": 2.0, "now": 3.2, "ratio": 1.6}
    }
    assert rep["new_queries"] == ["new"]
    assert rep["retired_queries"] == ["gone"]
    assert rep["carried_queries"] == 2


def test_ratio_report_missing_base_is_silent(bench_mod, monkeypatch, tmp_path):
    monkeypatch.setenv("SPARK_GRAFT_BENCH_BASE", "NO_SUCH.json")
    monkeypatch.setattr(
        bench_mod, "__file__", str(tmp_path / "bench.py"), raising=False
    )
    assert bench_mod._ratio_report({"a": 1.0}) == {}


def test_ratio_report_skips_errored_queries(bench_mod, monkeypatch, tmp_path):
    (tmp_path / "BASE.json").write_text(json.dumps({"a": {"min": 1.0}}))
    monkeypatch.setenv("SPARK_GRAFT_BENCH_BASE", "BASE.json")
    monkeypatch.setattr(
        bench_mod, "__file__", str(tmp_path / "bench.py"), raising=False
    )
    out = bench_mod._ratio_report({"a": -1.0})  # errored: no ratio
    assert out["carried_median_vs_base"] is None
    assert out["over_1_5x_count"] == 0


def test_standing_base_is_the_r8_freeze():
    """NOTES.md declares BENCHQ_r08 the base; the default must agree."""
    src = (REPO / "bench.py").read_text()
    assert '"SPARK_GRAFT_BENCH_BASE", "BENCHQ_r08.json"' in src
    assert (REPO / "BENCHQ_r08.json").exists()
