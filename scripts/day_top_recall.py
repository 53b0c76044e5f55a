#!/usr/bin/env python
"""Measure the ``day_top`` dial's pair recall against the exact
user-similarity output (VERDICT r05 item 6): the dial's docstring
claims IVF-probe-style recall semantics, so — like ann_ivf_probe2 —
the claim should carry a measured recall-vs-C curve, not just the
exactness-at-large-C unit test.

For each C, recall = |approx pairs ∩ exact pairs| / |exact pairs| over
the canonical (user_a, user_b) pair keys of the registered query's
exact output (top-5 per user_a). Also reported: how many surviving
pairs changed their top-5 SCORE ranking source (pairs whose cosine
dropped because a contributing day was truncated — the dial's
documented underestimate).

Usage: python scripts/day_top_recall.py [sf_dir] [C ...]
Defaults: /root/testdata/sf0.1 and C = 100 250 500 1000 1356
(1,356 = the sf0.1 busiest day's active-user count, the measured
exactness threshold). One session, exact output computed once and
localCheckpointed so every C compares against the same materialized
reference. Results feed SCALING.md's round-6 section.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from evaluate_human_balance_with_spark_streaming_spark.caching import release_managed
from evaluate_human_balance_with_spark_streaming_spark.plans.analytics_ext import (
    user_activity_similarity,
)
from evaluate_human_balance_with_spark_streaming_spark.session import get_spark
from evaluate_human_balance_with_spark_streaming_spark.sources.testdata import (
    load_table,
)


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and not args[0].isdigit():
        sf_dir = args.pop(0)
    cs = [int(a) for a in args] or [100, 250, 500, 1000, 1356]

    spark = get_spark("day-top-recall")
    events = load_table(spark, sf_dir, "events").select("user_id", "ts")
    events.count()  # warm the scan so C=first doesn't absorb cold-start

    exact = user_activity_similarity(events).localCheckpoint()
    n_exact = exact.count()
    release_managed()
    busiest = (
        events.groupBy(F.date_trunc("day", "ts"))
        .agg(F.count_distinct("user_id").alias("m"))
        .agg(F.max("m"))
        .first()[0]
    )
    print(f"exact pairs: {n_exact}; busiest-day actives: {busiest}")
    print(f"{'C':>6} {'pairs':>8} {'recall':>8} {'score==':>8} {'wall_s':>7}")
    for c in cs:
        t0 = time.time()
        # warn_below_busiest=False: this sweep KNOWINGLY probes
        # approximate C values, and the guard's extra stats job would
        # land inside this timed window, shifting the recorded walls
        # vs the r06-recorded curve.
        approx = user_activity_similarity(
            events, day_top=c, warn_below_busiest=False
        ).localCheckpoint()
        n_approx = approx.count()
        wall = time.time() - t0
        release_managed()
        hit = exact.join(approx, ["user_a", "user_b"], "left_semi").count()
        # Of the recalled pairs, how many carry the exact cosine too
        # (a truncated day on a surviving pair only LOWERS its score).
        same_score = exact.join(
            approx, ["user_a", "user_b", "cosine"], "left_semi"
        ).count()
        print(
            f"{c:>6} {n_approx:>8} {hit / max(n_exact, 1):>8.3f} "
            f"{same_score / max(n_exact, 1):>8.3f} {wall:>7.1f}"
        )


if __name__ == "__main__":
    main()
