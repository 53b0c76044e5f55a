#!/usr/bin/env python
"""Snapshot `.explain("formatted")` for named registered queries into
plans/<tag>/<query>_<suffix>.txt — the before/after evidence trail the
optimization rounds commit alongside plan-shape claims.

Usage:
    python scripts/plan_snapshot.py TAG SUFFIX [QUERY ...]

e.g. `python scripts/plan_snapshot.py r16 before stedi_flagship_join`.
With no QUERY args, snapshots every bench HEADLINE query. Batch queries
snapshot the final DataFrame's formatted plan; stream_* queries build
their streaming DataFrame via the registered function but the memory
sink materializes it, so for those we snapshot the *materialized*
result's plan plus (where the registry exposes it) nothing else —
micro-batch plans are runtime artifacts.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from evaluate_human_balance_with_spark_streaming_spark.plans.registry import (
    _ensure_loaded,
    QUERIES,
)
from evaluate_human_balance_with_spark_streaming_spark.caching import (
    release_managed,
)
from evaluate_human_balance_with_spark_streaming_spark.session import get_spark


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r16"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    _ensure_loaded()
    if len(sys.argv) > 3:
        names = sys.argv[3:]
        # Validate BEFORE building the Spark session (ADVICE r16: a
        # typo used to crash with a bare KeyError after session init).
        unknown = [n for n in names if n not in QUERIES]
        if unknown:
            print(
                f"unknown queries: {', '.join(unknown)}\navailable: "
                + ", ".join(sorted(QUERIES)),
                file=sys.stderr,
            )
            return 2
    else:
        import bench

        # stream_* queries materialize through a memory sink when built,
        # so their returned DataFrame's plan is just a memory-table scan;
        # the batch twins carry the shared pipeline's plan shape. Skip
        # them by default (name them explicitly to snapshot anyway).
        names = [n for n in bench.HEADLINE if not n.startswith("stream_")]
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("ehb-plan-snapshot")
    for name in names:
        fn = QUERIES[name].fn
        df = fn(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(f"# {name} ({suffix}) — explain('formatted') at {sf_dir}\n")
            fh.write(buf.getvalue())
        release_managed()
        print(f"wrote {path}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
