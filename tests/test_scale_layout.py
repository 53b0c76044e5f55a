"""Physical-layout scale techniques, proven on plans rather than
claimed: bucketed co-located joins (no exchange) and partition pruning
(directory-level skipping). These are the 100 TB layout levers the
docs reference (README 'Scale design', SCALING.md) — each asserted on
the actual physical plan.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    from evaluate_human_balance_with_spark_streaming_spark.sources.testdata import (
        load_table,
    )

    return load_table(spark, sf_dir, "events")


def test_bucketed_join_needs_no_exchange(spark, events, tmp_path_factory):
    """Both sides bucketed by the join key → SortMergeJoin with ZERO
    Exchange operators: the shuffle happened once at write time and is
    amortized over every subsequent join — the co-location story for
    repeated fact-fact joins at 100 TB."""
    spark.sql("DROP TABLE IF EXISTS ev_bucketed_a")
    spark.sql("DROP TABLE IF EXISTS ev_bucketed_b")
    (
        events.select("event_id", "user_id", "value")
        .write.bucketBy(8, "user_id")
        .sortBy("user_id")
        .mode("overwrite")
        .saveAsTable("ev_bucketed_a")
    )
    (
        events.select("event_id", "user_id", "event_type")
        .write.bucketBy(8, "user_id")
        .sortBy("user_id")
        .mode("overwrite")
        .saveAsTable("ev_bucketed_b")
    )
    a = spark.table("ev_bucketed_a")
    b = spark.table("ev_bucketed_b")
    # Disable broadcast so the join must pick a partitioned strategy —
    # the point is that bucketing satisfies its distribution for free.
    # Save/restore the previous value (not a hard-coded copy of the
    # session default) so the session conf survives unchanged for
    # whatever runs after this test.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, "user_id")
        plan = _plan(joined)
        assert "Exchange" not in plan, plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS ev_bucketed_a")
        spark.sql("DROP TABLE IF EXISTS ev_bucketed_b")


def test_partitioned_write_prunes_at_scan(spark, events, tmp_path_factory):
    """Hive-style partitioning by a low-cardinality column → a filter
    on that column becomes a PartitionFilter (directory pruning: the
    scan never opens non-matching partitions). At 100 TB this is the
    difference between reading one day and reading the lake."""
    out = str(tmp_path_factory.mktemp("part") / "events_by_type")
    (
        events.select("event_id", "user_id", "event_type", "value")
        .write.partitionBy("event_type")
        .mode("overwrite")
        .parquet(out)
    )
    df = spark.read.parquet(out).filter(F.col("event_type") == "click")
    plan = _plan(df)
    assert "PartitionFilters" in plan
    # The partition predicate must appear in PartitionFilters (pruned
    # at planning), not as a post-scan data filter.
    pf_section = plan.split("PartitionFilters:", 1)[1].split("]", 1)[0]
    assert "event_type" in pf_section, plan
    n_click = df.count()
    n_all = events.count()
    assert 0 < n_click < n_all


def test_aqe_splits_skewed_join_partition(spark):
    """AQE skew-join handling, asserted on the EXECUTED plan: one hot
    key dominating a sort-merge join must be split into multiple tasks
    at runtime ('skew=true' on the SortMergeJoin node). This is the
    no-manual-salting path the session config
    (spark.sql.adaptive.skewJoin.enabled) claims; the salted-key
    aggregate (q_event_value_profile's salted side) remains the explicit fallback
    where AQE can't see the skew (e.g. pre-aggregation)."""
    confs = {
        # Make the tiny test partitions look skewed to AQE.
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        # Force a sort-merge join so skew handling (not broadcast) kicks in.
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # 50k rows on ONE key + 100 singleton keys vs a 101-key dim.
        left = spark.range(50_000).select(
            F.lit(0).alias("k"), F.col("id").alias("payload")
        ).union(
            spark.range(1, 101).select(
                F.col("id").alias("k"), F.col("id").alias("payload")
            )
        )
        right = spark.range(101).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("attr")
        )
        joined = left.join(right, "k")
        # Materialize THIS DataFrame's own query execution (a count()
        # would spawn a separate one whose adaptive plan we can't read).
        assert len(joined.collect()) == 50_100
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
