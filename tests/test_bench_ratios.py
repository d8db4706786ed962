"""bench.py's standing regression ledger (_ratio_report): the computed
artifact the round relies on must compute medians/ratios correctly and
tolerate registry growth and retirement (VERDICT r8 item 1), and must not
clobber the sf0.1 ledger with cross-SF ratios (ADVICE r9)."""

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
    out = bench_mod._ratio_report(timings, 0.1, 5)
    assert out["carried_median_vs_base"] == pytest.approx(1.3, abs=1e-9)
    assert out["over_1_5x_count"] == 1
    rep = json.loads((tmp_path / "BENCH_RATIOS.json").read_text())
    assert rep["over_1_5x"] == {
        "b": {"base": 2.0, "now": 3.2, "ratio": 1.6}
    }
    assert rep["new_queries"] == ["new"]
    assert rep["retired_queries"] == ["gone"]
    assert rep["carried_queries"] == 2
    # ADVICE r9: the sidecar records the run's SF and sample count
    assert rep["run_sf"] == 0.1
    assert rep["base_sf"] == 0.1
    assert rep["runs_per_query"] == 5


def test_ratio_report_cross_sf_does_not_clobber(
    bench_mod, monkeypatch, tmp_path
):
    """A run at sf0.01 must write a separately named artifact and leave the
    standing sf0.1 BENCH_RATIOS.json untouched (ADVICE r9)."""
    (tmp_path / "BASE.json").write_text(json.dumps({"a": {"min": 1.0}}))
    standing = tmp_path / "BENCH_RATIOS.json"
    standing.write_text('{"sentinel": true}')
    monkeypatch.setenv("SPARK_GRAFT_BENCH_BASE", "BASE.json")
    monkeypatch.setattr(
        bench_mod, "__file__", str(tmp_path / "bench.py"), raising=False
    )
    out = bench_mod._ratio_report({"a": 2.0}, 0.01, 3)
    assert out["cross_sf_ratios"] is True
    assert out["ratios_file"].endswith("BENCH_RATIOS_sf0.01.json")
    # the standing ledger is untouched
    assert json.loads(standing.read_text()) == {"sentinel": True}
    rep = json.loads((tmp_path / "BENCH_RATIOS_sf0.01.json").read_text())
    assert "cross_sf_warning" in rep
    assert rep["run_sf"] == 0.01


def test_ratio_report_cross_cpu_does_not_clobber(
    bench_mod, monkeypatch, tmp_path
):
    """A run at 8 cores must write a separately named artifact and leave
    the standing 32-core BENCH_RATIOS.json untouched (VERDICT r10 item 3:
    the driver's 8-core scaling run clobbered the ledger with 25 garbage
    flags)."""
    (tmp_path / "BASE.json").write_text(json.dumps({"a": {"min": 1.0}}))
    standing = tmp_path / "BENCH_RATIOS.json"
    standing.write_text('{"sentinel": true}')
    monkeypatch.setenv("SPARK_GRAFT_BENCH_BASE", "BASE.json")
    monkeypatch.setattr(
        bench_mod, "__file__", str(tmp_path / "bench.py"), raising=False
    )
    out = bench_mod._ratio_report({"a": 2.0}, 0.1, 3, cpus=8)
    assert out["cross_cpu_ratios"] is True
    assert out["ratios_file"].endswith("BENCH_RATIOS_c8.json")
    # the standing ledger is untouched
    assert json.loads(standing.read_text()) == {"sentinel": True}
    rep = json.loads((tmp_path / "BENCH_RATIOS_c8.json").read_text())
    assert "cross_cpu_warning" in rep
    assert rep["run_cpus"] == 8
    assert rep["base_cpus"] == 32


def test_ratio_report_records_cpus_at_base_cores(
    bench_mod, monkeypatch, tmp_path
):
    """A 32-core run writes the standing ledger and records run_cpus."""
    (tmp_path / "BASE.json").write_text(json.dumps({"a": {"min": 1.0}}))
    monkeypatch.setenv("SPARK_GRAFT_BENCH_BASE", "BASE.json")
    monkeypatch.setattr(
        bench_mod, "__file__", str(tmp_path / "bench.py"), raising=False
    )
    out = bench_mod._ratio_report({"a": 2.0}, 0.1, 3, cpus=32)
    assert "cross_cpu_ratios" not in out
    assert out["ratios_file"].endswith("BENCH_RATIOS.json")
    rep = json.loads((tmp_path / "BENCH_RATIOS.json").read_text())
    assert rep["run_cpus"] == 32 and rep["base_cpus"] == 32


def test_ratio_report_missing_base_is_silent(bench_mod, monkeypatch, tmp_path):
    monkeypatch.setenv("SPARK_GRAFT_BENCH_BASE", "NO_SUCH.json")
    monkeypatch.setattr(
        bench_mod, "__file__", str(tmp_path / "bench.py"), raising=False
    )
    assert bench_mod._ratio_report({"a": 1.0}, 0.1, 3) == {}


def test_ratio_report_skips_errored_queries(bench_mod, monkeypatch, tmp_path):
    (tmp_path / "BASE.json").write_text(json.dumps({"a": {"min": 1.0}}))
    monkeypatch.setenv("SPARK_GRAFT_BENCH_BASE", "BASE.json")
    monkeypatch.setattr(
        bench_mod, "__file__", str(tmp_path / "bench.py"), raising=False
    )
    out = bench_mod._ratio_report({"a": -1.0}, 0.1, 3)  # errored: no ratio
    assert out["carried_median_vs_base"] is None
    assert out["over_1_5x_count"] == 0


def test_standing_base_is_the_r10_freeze():
    """NOTES.md declares BENCHQ_r10 the base; the default must agree."""
    src = (REPO / "bench.py").read_text()
    assert '"SPARK_GRAFT_BENCH_BASE", "BENCHQ_r10.json"' in src
    assert (REPO / "BENCHQ_r10.json").exists()
