#!/usr/bin/env python
"""Headline benchmark: run the engine's representative queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is timed end-to-end (plan build + execution + result fetch
via a count-style materialization). A small warmup query first removes
JVM/session startup from per-query numbers; total wall time for the
headline set is the headline metric.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from evaluate_human_balance_with_spark_streaming_spark.session import get_spark

# Headline set: one per capability family (parity decode/join, agg,
# multi-join, window fn, sessionization, dedup exact + LSH, similarity
# brute + IVF, text, multimodal, streaming join). Names must exist in
# the registry.
HEADLINE = [
    "stedi_decode_chain",
    "stedi_flagship_join",
    "q_pricing_summary",
    "q_top_revenue_orders",
    "q_nation_volume",
    "q_top_events_per_user",
    "q_user_sessions_gap",
    "q_session_window_stats",
    "q_asof_click_before_purchase",
    "q_risk_per_customer",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_bruteforce_topk",
    "ann_ivf_topk",
    "text_quality_score",
    "text_bpe_token_estimate",
    "mm_frame_sample",
    "stream_flagship_join",
]


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0)

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    spark = get_spark("ehb-bench")

    # Warmup: touch the fact table so JVM/codegen init doesn't bill q1.
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    timings: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        if name not in qs:
            continue
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        n = df.count()
        dt = round(time.time() - t0, 3)
        timings[name] = dt
        total += dt
        print(f"# {name}: {n} rows in {dt}s", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "headline_suite_wall",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
