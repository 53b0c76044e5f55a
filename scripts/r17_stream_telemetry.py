#!/usr/bin/env python
"""Per-micro-batch telemetry for the benched stream_* queries (r17
measure-first step): runs each registered stream query with
``progress_out`` captured (by wrapping streaming.runner.run_to_memory)
and prints the per-batch durationMs breakdown — where the replay's
wall time actually goes (queryPlanning vs addBatch vs walCommit vs
state commit), per guide §1.

Usage: python scripts/r17_stream_telemetry.py [QUERY ...] [REPS=2]
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from evaluate_human_balance_with_spark_streaming_spark.caching import (  # noqa: E402
    release_managed,
)
from evaluate_human_balance_with_spark_streaming_spark.plans.registry import (  # noqa: E402
    QUERIES,
    _ensure_loaded,
)
from evaluate_human_balance_with_spark_streaming_spark.session import get_spark  # noqa: E402
from evaluate_human_balance_with_spark_streaming_spark.streaming import (  # noqa: E402
    runner,
    stream_queries,
)

DEFAULT = [
    "stream_flagship_join",
    "stream_flagship_join_watermarked",
    "stream_dedup_within_watermark",
    "stream_session_quality",
]


def main() -> int:
    names = [a for a in sys.argv[1:] if not a.isdigit()] or DEFAULT
    reps = int(next((a for a in sys.argv[1:] if a.isdigit()), "2"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    _ensure_loaded()
    spark = get_spark("r17-stream-telemetry")
    stream_queries.prematerialize_wires(spark, sf_dir)

    captured: list[dict] = []
    real_rtm = runner.run_to_memory

    def wrapped(stream_df, output_mode="append", timeout_sec=300, progress_out=None):
        return real_rtm(
            stream_df, output_mode, timeout_sec, progress_out=captured
        )

    stream_queries.run_to_memory = wrapped
    for name in names:
        fn = QUERIES[name].fn
        for rep in range(reps):
            captured.clear()
            t0 = time.time()
            df = fn(spark, sf_dir)
            n = df.count()
            wall = time.time() - t0
            release_managed()
            batches = []
            for p in captured:
                d = p.get("durationMs", {})
                ops = p.get("stateOperators", [])
                batches.append(
                    {
                        "batchId": p.get("batchId"),
                        "rows": p.get("numInputRows"),
                        "durationMs": d,
                        "stateCommitMs": [
                            o.get("allUpdatesTimeMs", 0)
                            + o.get("commitTimeMs", 0)
                            for o in ops
                        ],
                    }
                )
            print(
                json.dumps(
                    {
                        "query": name,
                        "rep": rep,
                        "wall_s": round(wall, 3),
                        "rows": n,
                        "n_batches": len(batches),
                        "batches": batches,
                    }
                )
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
