"""The bench regression gate is strict by default (VERDICT r02 item 2):
these tests pin the gate math and the baseline-merge order without
spinning up Spark, and a subprocess test proves a deliberately slowed
query makes `python bench.py` exit non-zero.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from bench import _baseline_timings, find_regressions, report_and_gate


def test_find_regressions_flags_only_over_factor():
    baseline = {"a": 1.0, "b": 1.0, "c": 0.0, "d": 2.0}
    timings = {"a": 2.5, "b": 1.9, "c": 99.0, "e": 50.0}
    out = find_regressions(timings, baseline)
    # a: >2x → flagged; b: <2x → not; c: zero baseline ignored;
    # e: no baseline entry (UNGATED, reported separately) → not.
    assert out == {"a": {"now": 2.5, "baseline": 1.0}}


def test_baseline_merges_extra_under_newest_bench(tmp_path):
    (tmp_path / "BENCH_BASELINE_EXTRA.json").write_text(
        json.dumps({"queries": {"new_q": 1.5, "old_q": 99.0}})
    )
    (tmp_path / "BENCH_r1.json").write_text(
        json.dumps({"parsed": {"queries": {"old_q": 3.0, "gone_q": 1.0}}})
    )
    (tmp_path / "BENCH_r2.json").write_text(
        json.dumps({"parsed": {"queries": {"old_q": 2.0}}})
    )
    got = _baseline_timings(str(tmp_path))
    # Newest BENCH wins for old_q (2.0, not the EXTRA 99.0 or r1's
    # 3.0); EXTRA fills queries the driver hasn't recorded yet.
    assert got == {"new_q": 1.5, "old_q": 2.0}


def test_baseline_empty_dir(tmp_path):
    assert _baseline_timings(str(tmp_path)) == {}


def test_gate_fails_run_on_regression_by_default(monkeypatch, capsys):
    """A deliberately slowed query makes the bench exit non-zero with
    no env var set (VERDICT r02 item 2's done-criterion)."""
    monkeypatch.delenv("SPARK_GRAFT_BENCH_LENIENT", raising=False)
    monkeypatch.setattr(bench, "_baseline_timings", lambda: {"q": 1.0})
    rc = report_and_gate({"q": 5.0}, 5.0, 5.0, sf=0.1, reps=2)
    assert rc == 1
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert line["metric"] == "headline_suite_best_sum"
    assert line["regressions"] == {"q": {"now": 5.0, "baseline": 1.0}}


def test_gate_lenient_optout_and_clean_pass(monkeypatch, capsys):
    monkeypatch.setattr(bench, "_baseline_timings", lambda: {"q": 1.0})
    monkeypatch.setenv("SPARK_GRAFT_BENCH_LENIENT", "1")
    assert report_and_gate({"q": 5.0}, 5.0, 5.0, sf=0.1, reps=2) == 0
    monkeypatch.delenv("SPARK_GRAFT_BENCH_LENIENT")
    assert report_and_gate({"q": 1.2}, 1.2, 1.2, sf=0.1, reps=2) == 0
    capsys.readouterr()
