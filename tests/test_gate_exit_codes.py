"""Meta-tests on the verification gates themselves.

Round 7 landed a red gate as green once: a ``cmd | tee`` chain without
pipefail masked a non-zero exit (commit 5fd410e).  The process fix is
pipefail in the shell; the code fix pinned here is that BOTH gate
programs — ``tools/check.py`` and ``bench.py`` — exit non-zero on any
query failure, so a correctly-wired gate can never report a red run as
green.  Also pins the compact bench line's byte budget at registry sizes
well past today's (the driver parses only a ~2 KB stdout tail).
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(path: str, name: str):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def bench():
    return _load(os.path.join(REPO, "bench.py"), "bench_under_test")


def test_compact_line_fits_budget_at_230_plus_entries(bench):
    """At ≥230 registry entries (today: 204) the one-line stdout record
    must still parse and fit the driver's tail budget — the shown-query
    count adapts to bytes, it is not a static cap."""
    timings = {f"very_long_query_name_padding_{i:04d}": round(0.1 + i * 0.01, 3)
               for i in range(240)}
    line = bench.compact_line(timings, total=123.456, load_sec=6.0, sf=0.1)
    encoded = json.dumps(line, allow_nan=False)
    assert len(encoded) <= 1900
    parsed = json.loads(encoded)
    assert parsed["n_queries"] == 240
    assert parsed["queries_shown"] == len(parsed["queries"]) > 0
    # the shown set is the slowest — the round-over-round comparison set
    slowest = max(timings, key=timings.get)
    assert slowest in parsed["queries"]


def test_compact_line_counts_failures(bench):
    timings = {"ok_query": 1.0, "failed_query": None}
    line = bench.compact_line(timings, total=1.0, load_sec=0.0, sf=0.01)
    assert line["n_failed"] == 1
    assert "failed_query" not in line["queries"]


def test_check_py_exits_nonzero_on_spark_failure(spark, tmp_path, monkeypatch):
    """A spark-side error in any selected query must FAIL the run and flip
    the exit code — in-process drive of tools/check.py's main() with a
    deliberately-broken registry entry."""
    from basin_climbing_data_pipeline_spark import registry

    check = _load(os.path.join(REPO, "tools", "check.py"), "check_under_test")

    def boom(_spark, _sf_dir):
        raise RuntimeError("meta-test probe: forced spark failure")

    monkeypatch.setitem(
        registry.REGISTRY, "meta_fail_probe", (boom, "SELECT 1 AS x")
    )
    out = tmp_path / "probe.json"
    monkeypatch.setattr(
        sys, "argv",
        ["check.py", "/root/testdata/sf0.001", "meta_fail_probe",
         "--json", str(out)],
    )
    rc = check.main()
    assert rc != 0
    rec = json.loads(out.read_text())
    assert rec["n_fail"] == 1 and rec["n_pass"] == 0


def test_check_py_exits_zero_on_green(spark, monkeypatch):
    check = _load(os.path.join(REPO, "tools", "check.py"), "check_under_test2")
    monkeypatch.setattr(
        sys, "argv", ["check.py", "/root/testdata/sf0.001", "entry_method_counts"]
    )
    assert check.main() == 0


def test_bench_main_exits_nonzero_on_query_failure(spark, tmp_path, monkeypatch, bench):
    """bench.py's main() must return non-zero when any query fails — the
    full run is driven at sf0.001 with the registry shrunk to one passing
    and one failing entry (warm phase self-skips when warm_dir == sf_dir;
    the full-record path is redirected off the committed artifact)."""
    from basin_climbing_data_pipeline_spark import registry

    def boom(_spark, _sf_dir):
        raise RuntimeError("meta-test probe: forced bench failure")

    ok_fn = registry.REGISTRY["entry_method_counts"][0]
    tiny = {
        "entry_method_counts": (ok_fn, None),
        "meta_fail_probe": (boom, None),
    }
    monkeypatch.setattr(bench, "REGISTRY", tiny)
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    monkeypatch.setenv("SPARK_GRAFT_BENCH_FULL", str(tmp_path / "full.json"))
    rc = bench.main()
    assert rc != 0
    rec = json.loads((tmp_path / "full.json").read_text())
    assert rec["queries"]["meta_fail_probe"] is None
    # the per-rep spread record (round-11 verdict order #4): one list per
    # query, one slot per rep run, failures as null, min(list) == profile
    assert set(rec["queries_reps"]) == set(rec["queries"])
    for name, walls in rec["queries_reps"].items():
        assert len(walls) == rec["reps"]
        ok = [w for w in walls if w is not None]
        assert (min(ok) if ok else None) == rec["queries"][name]
