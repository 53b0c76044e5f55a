#!/usr/bin/env python
"""Stop-on-success baseline-record campaign (VERDICT r13 item 2): run
`SPARK_GRAFT_RECORD_BASELINE=1 python bench.py` up to N times spaced
GAP minutes apart, appending one campaign line per run to the sidecar
(same schema as scripts/campaign.py, per-run stderr kept), and STOP
the moment maybe_record_baseline accepts a recording — detected by
BENCH_BASELINE.json's mtime advancing. Each run's own probe-gated
admission hunts a clean start window; the record gate then holds the
whole recording to the 1.05x clean-pin bars, so the first accepted
write is by construction the reps-parity re-record the verdict asks
for (bench times the three floored queries best-of-5 via
reps_overrides).

With SPARK_GRAFT_RECORD_BASELINE_QUERIES="a,b,c" in the environment
(inherited by each run), the accepted recording lands as a targeted
reps-parity PATCH — only the named entries, only downward — instead
of a full re-record; the full path is guarded by the median-vs-
standing ratchet check either way (bench._record_vs_standing_error).

Usage: python scripts/record_campaign.py [N=12] [GAP_MIN=8] [OUT=CAMPAIGN_r14.jsonl]
Exit 0 if a baseline was recorded/patched, 3 if the campaign exhausted N runs.
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
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    gap_min = float(sys.argv[2]) if len(sys.argv) > 2 else 8.0
    out = sys.argv[3] if len(sys.argv) > 3 else os.path.join(HERE, "CAMPAIGN_r14.jsonl")
    self_path = os.path.join(HERE, bench.SELF_ARTIFACT_FILE)
    base_path = os.path.join(HERE, "BENCH_BASELINE.json")
    env = dict(os.environ, SPARK_GRAFT_RECORD_BASELINE="1")
    for run in range(1, n + 1):
        t_start = time.time()
        before_self = os.path.getmtime(self_path) if os.path.exists(self_path) else None
        before_base = os.path.getmtime(base_path) if os.path.exists(base_path) else None
        run_log = bench.campaign_run_log_path(out, run)
        with open(run_log, "w") as logf:
            proc = subprocess.run(
                [sys.executable, os.path.join(HERE, "bench.py")],
                cwd=HERE,
                env=env,
                stdout=subprocess.DEVNULL,
                stderr=logf,
            )
        art = {}
        try:
            after = os.path.getmtime(self_path)
            if before_self is None or after > before_self:
                with open(self_path) as f:
                    art = json.load(f)
        except (OSError, ValueError):
            art = {}
        line = bench.campaign_line(
            art,
            kind="record",
            run=run,
            exit_code=proc.returncode,
            log=os.path.relpath(run_log, HERE),
        )
        bench.append_campaign_line(line, out)
        recorded = (
            os.path.exists(base_path)
            and (before_base is None or os.path.getmtime(base_path) > before_base)
        )
        print(
            f"# record run {run}/{n}: exit {proc.returncode}, suite "
            f"{line['value_s']}s, probe_vs_pin {line['probe_vs_pin']}, "
            f"stream_vs_pin {line['stream_vs_pin']}, probe_clean "
            f"{line['probe_clean']}, recorded {recorded}",
            file=sys.stderr,
        )
        if recorded:
            return 0
        if run < n:
            remaining = gap_min * 60.0 - (time.time() - t_start)
            if remaining > 0:
                time.sleep(remaining)
    return 3


if __name__ == "__main__":
    sys.exit(main())
