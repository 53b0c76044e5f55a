"""The bench regression gate is strict by default (VERDICT r02 item 2):
these tests pin the gate math — drift-aware per-query flagging, the
suite-wide backstop, baseline-merge order, and the strict/lenient exit
codes via report_and_gate (main()'s only gate path) — without spinning
up Spark.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from bench import (
    _baseline_timings,
    find_regressions,
    report_and_gate,
    suite_drift,
)


def test_find_regressions_flags_only_over_factor():
    baseline = {"a": 1.0, "b": 1.0, "c": 0.0, "d": 2.0, "e": 1.0, "f": 1.0}
    timings = {"a": 2.5, "b": 1.9, "c": 99.0, "e": 1.0, "f": 1.0, "g": 50.0}
    out = find_regressions(timings, baseline)
    # Drift: median of (2.5, 1.9, 1.0, 1.0) = 1.45 → adjusted bar for
    # a is 2.9 → a squeaks under; bump a to make the flag definitive.
    assert out == {}
    timings["a"] = 3.0
    out = find_regressions(timings, baseline)
    # a: >2x drift-adjusted → flagged; b: <2x → not; c: zero baseline
    # ignored; g: no baseline entry (UNGATED) → not.
    assert set(out) == {"a"}
    assert out["a"]["now"] == 3.0 and out["a"]["baseline"] == 1.0


def test_drift_correction_forgives_uniform_load():
    """A loaded machine slowing EVERYTHING 1.5x flags nothing; a query
    an additional >2x beyond that drift is still flagged."""
    baseline = {q: 1.0 for q in "abcdefgh"}
    timings = {q: 1.5 for q in "abcdefgh"}
    assert find_regressions(timings, baseline) == {}
    timings["a"] = 3.5  # 3.5x raw, 2.33x beyond the 1.5x drift
    out = find_regressions(timings, baseline)
    assert set(out) == {"a"}


def test_suite_wide_regression_not_masked():
    """If the median itself exceeds the factor, drift correction must
    NOT excuse it — the gate fails with a __suite__ entry."""
    baseline = {q: 1.0 for q in "abcdef"}
    timings = {q: 2.5 for q in "abcdef"}
    out = find_regressions(timings, baseline)
    assert set(out) == {"__suite__"}
    assert out["__suite__"]["now"] == 2.5


def test_drift_floored_at_one():
    """A faster machine (ratios < 1) never loosens the bar: drift
    stays 1.0 and a 2.5x query is still flagged."""
    baseline = {q: 1.0 for q in "abcde"}
    timings = {q: 0.5 for q in "abcde"}
    assert suite_drift(timings, baseline) == 1.0
    timings["a"] = 2.5
    out = find_regressions(timings, baseline)
    assert set(out) == {"a"}


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
    monkeypatch.setattr(
        bench, "_baseline_timings", lambda: {"q": 1.0, "r": 1.0, "s": 1.0}
    )
    rc = report_and_gate(
        {"q": 5.0, "r": 1.0, "s": 1.0}, 7.0, 7.0, sf=0.1, reps=2
    )
    assert rc == 1
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert line["metric"] == "headline_suite_best_sum"
    assert line["regressions"] == {
        "q": {"now": 5.0, "baseline": 1.0, "drift": 1.0}
    }


def test_comparable_subset_in_report(monkeypatch, capsys):
    """The JSON line carries the like-for-like numbers: sums restricted
    to baseline-gated queries (suite growth must not skew round-over-
    round comparison) plus the drift estimate."""
    monkeypatch.delenv("SPARK_GRAFT_BENCH_LENIENT", raising=False)
    monkeypatch.setattr(bench, "_baseline_timings", lambda: {"q": 1.0, "r": 1.0})
    rc = report_and_gate(
        {"q": 1.4, "r": 1.6, "new_q": 2.0}, 5.0, 5.0, sf=0.1, reps=2
    )
    assert rc == 0
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert line["comparable"] == {
        "queries": 2,
        "sum_now": 3.0,
        "sum_baseline": 2.0,
        "suite_drift": 1.5,
    }


def test_gate_lenient_optout_and_clean_pass(monkeypatch, capsys):
    monkeypatch.setattr(
        bench, "_baseline_timings", lambda: {"q": 1.0, "r": 1.0, "s": 1.0}
    )
    monkeypatch.setenv("SPARK_GRAFT_BENCH_LENIENT", "1")
    assert (
        report_and_gate({"q": 5.0, "r": 1.0, "s": 1.0}, 7.0, 7.0, sf=0.1, reps=2)
        == 0
    )
    monkeypatch.delenv("SPARK_GRAFT_BENCH_LENIENT")
    assert (
        report_and_gate({"q": 1.2, "r": 1.0, "s": 1.0}, 3.2, 3.2, sf=0.1, reps=2)
        == 0
    )
    capsys.readouterr()
