#!/usr/bin/env python
"""Solo rep-series instrument — the SCALING.md r11/r12 watch-item
playbook, formalized and made machine-readable (VERDICT r12 items 2/3
ask for exactly this evidence, item 6 for exactly this artifact).

Runs ONE registered query for N reps on the live box with the same
instrument bench.py uses — lineitem + streaming warmup, then an
anchored settled scan probe and stream probe BEFORE the series and
again AFTER — and emits one campaign line (kind="solo") on stdout:

    {"kind": "solo", "queries": {NAME: floor}, "series": [...],
     "probe_pre_s": ..., "probe_post_s": ..., "probe_vs_pin": ...,
     "stream_probe_post_s": ..., "stream_vs_pin": ...,
     "probe_clean": ..., "loadavg_pre": ..., ...}

The line appends to $SPARK_GRAFT_CAMPAIGN (e.g. CAMPAIGN_r13.jsonl)
when set, so a watch-item discharge — "floor <= 1.2x baseline on a
window whose probes read close to pin" — is checkable from the
sidecar alone instead of from SCALING.md prose.

Usage: python scripts/solo_series.py QUERY [REPS=8] [SF_DIR]
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import bench  # noqa: E402
from evaluate_human_balance_with_spark_streaming_spark.caching import (  # noqa: E402
    release_managed,
)
from evaluate_human_balance_with_spark_streaming_spark.session import (  # noqa: E402
    get_spark,
)


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__, file=sys.stderr)
        return 2
    name = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    sf_dir = (
        sys.argv[3]
        if len(sys.argv) > 3
        else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0)
    except ValueError:
        sf = 0.0

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    if name not in qs:
        print(f"unknown query {name!r}; registry has {len(qs)}", file=sys.stderr)
        return 2

    load_pre = bench._loadavg()
    spark = get_spark("ehb-solo")
    # Same warmup protocol as bench.main(): the series must measure
    # the query, not session/streaming-machinery first-JIT.
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    bench._streaming_warmup(spark, sf_dir)

    probe_base = bench._baseline_probe()
    sprobe_base = bench._baseline_stream_probe()
    probe_pre, probe_pre_series = bench.calibration_probe(spark, target_s=probe_base)
    sprobe_pre, _ = bench.streaming_calibration_probe(spark, target_s=sprobe_base)

    series: list[float] = []
    for i in range(max(1, reps)):
        t0 = time.time()
        n = qs[name](spark, sf_dir).count()
        series.append(round(time.time() - t0, 3))
        print(f"# rep {i + 1}/{reps}: {series[-1]}s ({n} rows)", file=sys.stderr)
    release_managed()

    probe_post, probe_post_series = bench.calibration_probe(spark, target_s=probe_base)
    sprobe_post, _ = bench.streaming_calibration_probe(spark, target_s=sprobe_base)

    floor = min(series)
    calibration = {
        "probe_s": min(probe_pre, probe_post),
        "probe_pre_s": probe_pre,
        "probe_post_s": probe_post,
        "probe_pre_series": probe_pre_series,
        "probe_post_series": probe_post_series,
        "stream_probe_s": min(sprobe_pre, sprobe_post),
        "stream_probe_pre_s": sprobe_pre,
        "stream_probe_post_s": sprobe_post,
    }
    ref = bench._clean_probe_reference()
    artifact = {
        "sf": sf,
        "value": floor,
        "queries": {name: floor},
        "series": series,
        "calibration": calibration,
        "load": {"loadavg_pre": load_pre, "cpus": os.cpu_count()},
        "probe_clean": bench.probe_clean_flag(
            bench._worst_probe(calibration, "probe"),
            bench._settled_stream_probe(calibration),
            ref,
        ),
    }
    line = bench.campaign_line(artifact, kind="solo")
    baseline = bench._baseline_timings().get(name)
    if baseline:
        print(
            f"# {name}: floor {floor}s vs baseline {baseline}s = "
            f"{floor / baseline:.2f}x; scan probe worst "
            f"{bench._worst_probe(calibration, 'probe')}s = "
            f"{bench._worst_probe(calibration, 'probe') / ref['probe_s']:.2f}x "
            f"of pin; stream post {sprobe_post}s = "
            f"{sprobe_post / ref['stream_probe_s']:.2f}x of pin",
            file=sys.stderr,
        )
    out = os.environ.get("SPARK_GRAFT_CAMPAIGN")
    if out:
        bench.append_campaign_line(line, out)
        print(f"# appended to {out}", file=sys.stderr)
    bench.shutdown_spark(spark)
    print(json.dumps(line))
    return 0


if __name__ == "__main__":
    sys.exit(main())
