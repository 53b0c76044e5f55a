#!/usr/bin/env python
"""Strict-campaign driver (VERDICT r12 item 6): run `python bench.py`
N times spaced GAP minutes apart and append one machine-readable
campaign line per run (bench.campaign_line over the run's
BENCH_SELF.json full artifact, plus the run's exit code) to the
campaign sidecar. The r11/r12 overnight campaigns produced exactly
this evidence — window probes, suite sums, per-query bests — but only
as SCALING.md prose; the sidecar makes the best-window per-query
floors that discharge watch items checkable by a reader (the judge,
next round's analysis) without parsing markdown.

Usage: python scripts/campaign.py [N=6] [GAP_MIN=10] [OUT=CAMPAIGN_r13.jsonl]

Each bench run inherits the process environment, so the probe-gated
admission / idle-wait knobs (SPARK_GRAFT_WAIT_IDLE) apply per run.
The gap is measured from run START to next START (a slow run eats its
own gap) and never goes negative. A run whose BENCH_SELF.json cannot
be read still lands a line (sparse fields + exit code): a failed run
is evidence the campaign must record, not skip.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import bench  # noqa: E402


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    gap_min = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0
    out = sys.argv[3] if len(sys.argv) > 3 else os.path.join(HERE, "CAMPAIGN_r13.jsonl")
    self_path = os.path.join(HERE, bench.SELF_ARTIFACT_FILE)
    for run in range(1, n + 1):
        t_start = time.time()
        # Stale-sidecar guard: a run that dies before writing its
        # sidecar must not get the PREVIOUS run's artifact projected
        # under its exit code.
        before = os.path.getmtime(self_path) if os.path.exists(self_path) else None
        # Per-run stderr log (ADVICE r13): when a run dies before
        # writing BENCH_SELF.json the sidecar line carries only an
        # exit code — the gate/refusal/crash output must survive
        # somewhere or "a failed run is evidence" is hollow. stdout
        # (the metric line, duplicated in the sidecar) stays dropped.
        run_log = bench.campaign_run_log_path(out, run)
        with open(run_log, "w") as logf:
            proc = subprocess.run(
                [sys.executable, os.path.join(HERE, "bench.py")],
                cwd=HERE,
                stdout=subprocess.DEVNULL,
                stderr=logf,
            )
        art = {}
        try:
            after = os.path.getmtime(self_path)
            if before is None or after > before:
                with open(self_path) as f:
                    art = json.load(f)
        except (OSError, ValueError):
            art = {}
        line = bench.campaign_line(
            art,
            kind="suite",
            run=run,
            exit_code=proc.returncode,
            log=os.path.relpath(run_log, HERE),
        )
        bench.append_campaign_line(line, out)
        print(
            f"# run {run}/{n}: exit {proc.returncode}, suite "
            f"{line['value_s']}s, probe_vs_pin {line['probe_vs_pin']}, "
            f"stream_vs_pin {line['stream_vs_pin']}, "
            f"probe_clean {line['probe_clean']}",
            file=sys.stderr,
        )
        if run < n:
            remaining = gap_min * 60.0 - (time.time() - t_start)
            if remaining > 0:
                time.sleep(remaining)
    return 0


if __name__ == "__main__":
    sys.exit(main())
