"""Relational analytics surface: the aggregation/window/sort/set-op
capabilities the reference *intended* (its two optional jobs — risk
score calculation and risk quality aggregation — are empty import stubs,
reference sparkpyoptionalriskcalculation.py:1-9 and
sparkpyoptionalriskquality.py:1-3), realized as first-class queries on
the synthetic star schema, plus classic pricing/volume analytics that
exercise multi-join planning at scale.

Scale notes (100 TB discipline):
- BOUNDED dims (region: 5 rows, nation: 25 rows at every SF) carry
  explicit broadcast hints; SF-SCALING tables (customer/supplier/
  part) join UNHINTED so the threshold/AQE broadcasts them while
  they fit and degrades to shuffle joins at the 100 TB target — a
  forced hint on a linearly-growing side would blow the 8 GB
  broadcast hard limit (review finding);
- aggregates are expressed as groupBy().agg() of built-ins, which
  Catalyst executes with map-side partial aggregation (HashAggregate
  partial → shuffle on group keys → final);
- every LIMIT is preceded by a total order with a unique tiebreaker, so
  results are deterministic under any partitioning;
- floating outputs are rounded on both Spark and oracle sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.testdata import load_table
from .registry import register

# Exact decimal casts for money/score columns (all 2-dp in the data).
# Summing decimals is exact and therefore order-independent — double
# sums are not (partition order changes the last bits, which breaks
# both the DuckDB hash-match and run-to-run reproducibility at scale).
# Pattern: aggregate exactly in decimal, convert once to double, then
# do any scalar math — identical IEEE ops on identical inputs are
# deterministic in every engine.


def _dec2(c: F.Column) -> F.Column:
    return c.cast("decimal(18,2)")


def _dec4(c: F.Column) -> F.Column:
    return c.cast("decimal(4,2)")


def _one() -> F.Column:
    # Built lazily: Column construction needs an active SparkContext,
    # so this can't be a module-level constant.
    return F.lit(1).cast("decimal(3,2)")


@register(
    "q_pricing_summary",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(CAST(l_quantity AS DECIMAL(18,2)))::DOUBLE, 4) AS sum_qty,
               ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))::DOUBLE, 4) AS sum_base_price,
               ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                         * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))))::DOUBLE,
                     4) AS sum_disc_price,
               ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                         * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))
                         * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(4,2))))::DOUBLE,
                     4) AS sum_charge,
               ROUND(SUM(CAST(l_quantity AS DECIMAL(18,2)))::DOUBLE / COUNT(*), 6) AS avg_qty,
               ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))::DOUBLE / COUNT(*), 6) AS avg_price,
               ROUND(SUM(CAST(l_discount AS DECIMAL(4,2)))::DOUBLE / COUNT(*), 6) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg",),
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-style pricing summary: filtered scan → 6-way aggregate
    over a 2-column group. The shipdate predicate and the 7-column
    projection must reach the parquet scan (PushedFilters/ReadSchema)."""
    l = load_table(spark, sf_dir, "lineitem")
    qty = _dec2(F.col("l_quantity"))
    price = _dec2(F.col("l_extendedprice"))
    disc = _dec4(F.col("l_discount"))
    disc_price = price * (_one() - disc)
    charge = disc_price * (_one() + _dec4(F.col("l_tax")))
    n = F.count(F.lit(1))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(qty).cast("double"), 4).alias("sum_qty"),
            F.round(F.sum(price).cast("double"), 4).alias("sum_base_price"),
            F.round(F.sum(disc_price).cast("double"), 4).alias("sum_disc_price"),
            F.round(F.sum(charge).cast("double"), 4).alias("sum_charge"),
            F.round(F.sum(qty).cast("double") / n, 6).alias("avg_qty"),
            F.round(F.sum(price).cast("double") / n, 6).alias("avg_price"),
            F.round(F.sum(disc).cast("double") / n, 6).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


@register(
    "q_top_revenue_orders",
    oracle="""
        SELECT o.o_orderkey, c.c_mktsegment,
               ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                         * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(4,2))))::DOUBLE,
                     4) AS revenue
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderstatus = 'O'
        GROUP BY o.o_orderkey, c.c_mktsegment
        ORDER BY revenue DESC, o_orderkey ASC
        LIMIT 10
    """,
    tags=("join", "sort", "limit"),
)
def q_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact join + dimension join + top-k. customer joins
    UNHINTED: unlike nation/region it scales linearly with the fact
    tables (TPC-H SF), so a forced F.broadcast would exceed the 8 GB
    broadcast hard limit at the 100 TB target — the threshold/AQE
    picks broadcast while customer fits and falls back to a shuffle
    join when it doesn't (review finding). orderkey tiebreaker makes
    LIMIT deterministic.

    r16 restructure (guide §2.3 "aggregate before you shuffle"):
    revenue is aggregated per (o_orderkey, o_custkey) BEFORE the
    customer join — o_orderkey functionally determines o_custkey
    (orders PK) and c_custkey is unique, so each original
    (o_orderkey, c_mktsegment) group is exactly one pre-aggregated
    row and the decimal sum (exact, associative) is unchanged. The
    customer join's probe side shrinks from |lineitem| joined rows to
    |orders| aggregated rows, and the mktsegment string never rides
    the wide shuffle."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    per_order = (
        l.join(
            o.filter(F.col("o_orderstatus") == "O"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderkey", "o_custkey")
        .agg(
            F.sum(
                _dec2(F.col("l_extendedprice")) * (_one() - _dec4(F.col("l_discount")))
            ).alias("_rev")
        )
    )
    return (
        per_order.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "o_orderkey",
            "c_mktsegment",
            F.round(F.col("_rev").cast("double"), 4).alias("revenue"),
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


@register(
    "q_nation_volume",
    oracle="""
        SELECT r.r_name AS region, n.n_name AS nation,
               ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                         * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(4,2))))::DOUBLE,
                     4) AS volume,
               COUNT(*) AS n_items
        FROM region r
        JOIN nation n ON n.n_regionkey = r.r_regionkey
        JOIN customer c ON c.c_nationkey = n.n_nationkey
        JOIN orders o ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY r.r_name, n.n_name
    """,
    tags=("join", "agg"),
)
def q_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5-style snowflake join. nation/region are BOUNDED dims
    (25/5 rows at every SF) and carry explicit broadcast hints; the
    customer-derived `dims` side is deliberately UNHINTED — customer
    scales linearly with the fact tables, so a forced broadcast would
    blow the 8 GB broadcast limit at the 100 TB target (review
    finding). The threshold/AQE still broadcasts `dims` while it
    fits, keeping the only shuffle the final group-by locally, and
    degrades to a shuffle join at scale."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    dims = (
        c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select("c_custkey", "n_name", "r_name")
    )
    # r16 restructure (guide §2.3 "aggregate before you shuffle"): the
    # before-plan shuffled EVERY joined lineitem row by custkey through
    # a SortMergeJoin against dims before reducing to 25 groups
    # (plans/r16/q_nation_volume_before.txt nodes (8)/(22)-(24)). Since
    # c_custkey is unique (each custkey maps to exactly one
    # nation/region) and the decimal sum is exact and associative,
    # aggregating per o_custkey first and re-aggregating the partial
    # sums after the dims join is value-identical — the custkey
    # exchange now carries one slim partial row per customer instead of
    # every lineitem, at any scale.
    per_cust = (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(
            F.sum(
                _dec2(F.col("l_extendedprice")) * (_one() - _dec4(F.col("l_discount")))
            ).alias("_vol"),
            F.count(F.lit(1)).alias("_n"),
        )
    )
    return (
        per_cust.join(dims, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.round(F.sum("_vol").cast("double"), 4).alias("volume"),
            F.sum("_n").alias("n_items"),
        )
    )


@register(
    "q_risk_per_customer",
    oracle="""
        SELECT user_id,
               COUNT(*) AS n_assessments,
               ROUND(SUM(CAST(value AS DECIMAL(18,2)))::DOUBLE / COUNT(*), 6) AS avg_score,
               ROUND(MIN(value), 6) AS min_score,
               ROUND(MAX(value), 6) AS max_score,
               ROUND(sqrt(greatest(
                   (COUNT(*) * SUM(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2)))::DOUBLE
                    - (SUM(CAST(value AS DECIMAL(18,2)))::DOUBLE
                       * SUM(CAST(value AS DECIMAL(18,2)))::DOUBLE))
                   / (COUNT(*) * (COUNT(*) - 1)), 0.0)), 6) AS stddev_score
        FROM events
        GROUP BY user_id
        HAVING COUNT(*) >= 4
    """,
    tags=("agg", "phase3"),
)
def q_risk_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The intent of the reference's empty risk-calculation stub
    (sparkpyoptionalriskcalculation.py:1-9; 'score after ≥4 assessments'
    per README.md:96): per-customer aggregate gated on assessment count."""
    e = load_table(spark, sf_dir, "events")
    # value is 2-dp in the data: decimal sums are exact, so avg/stddev
    # are order-independent (sum-of-squares formula from exact sums,
    # identical IEEE ops on both engines after one decimal→double cast).
    v = F.col("value").cast("decimal(18,2)")
    n = F.count(F.lit(1))
    s = F.sum(v).cast("double")
    s2 = F.sum(v * v).cast("double")
    var = F.greatest((n * s2 - s * s) / (n * (n - 1)), F.lit(0.0))
    return (
        e.groupBy("user_id")
        .agg(
            n.alias("n_assessments"),
            F.round(s / n, 6).alias("avg_score"),
            F.round(F.min("value"), 6).alias("min_score"),
            F.round(F.max("value"), 6).alias("max_score"),
            F.round(F.sqrt(var), 6).alias("stddev_score"),
        )
        .filter(F.col("n_assessments") >= 4)
    )


def q_windowed_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The intent of the reference's empty risk-quality stub
    (sparkpyoptionalriskquality.py:1-3): tumbling event-time windows ×
    event type. Calls streaming/aggregates.py::windowed_quality — the
    IDENTICAL code that runs streaming with a watermark — plus an
    exact countDistinct via its extra_aggs hook.

    UNREGISTERED as of round 4 (registry holds a hard 50-query cap —
    see plans/registry.py): the operator itself is driver-certified
    through `stream_windowed_quality`, which runs the same
    windowed_quality code on the real streaming path against the same
    relational oracle; the freed row funds `stream_session_quality`
    (VERDICT r03 item 5). The extra_aggs hook + exact countDistinct
    this batch twin adds stays covered by
    tests/test_streaming.py (batch-twin equivalence) and this
    function remains the batch entry point."""
    from ..streaming.aggregates import windowed_quality

    e = load_table(spark, sf_dir, "events")
    # THE streaming operator, not a re-implementation (extra_aggs adds
    # the exact distinct count that only batch can afford).
    return windowed_quality(
        e, extra_aggs=(F.countDistinct("user_id").alias("n_users"),)
    )


@register(
    "q_user_sessions_gap",
    oracle="""
        WITH seq AS (
            SELECT user_id, ts,
                   LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
            FROM events
        ),
        flagged AS (
            SELECT user_id, ts,
                   CASE WHEN prev_ts IS NULL
                             OR floor(epoch(ts)) - floor(epoch(prev_ts)) > 3600
                        THEN 1 ELSE 0 END AS new_session
            FROM seq
        )
        SELECT user_id,
               CAST(SUM(new_session) AS BIGINT) AS n_sessions,
               COUNT(*) AS n_events
        FROM flagged
        GROUP BY user_id
    """,
    tags=("window-function", "sessionization"),
)
def q_user_sessions_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (1h inactivity) via LAG — the batch
    equivalent of a session_window streaming aggregate. One shuffle on
    user_id shared by the window and the final group-by."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = e.withColumn("prev_ts", F.lag("ts").over(w)).withColumn(
        "new_session",
        F.when(
            F.col("prev_ts").isNull()
            | (F.unix_timestamp("ts") - F.unix_timestamp("prev_ts") > 3600),
            1,
        ).otherwise(0),
    )
    return flagged.groupBy("user_id").agg(
        F.sum("new_session").alias("n_sessions"), F.count(F.lit(1)).alias("n_events")
    )


@register(
    "q_supplier_part_share",
    oracle="""
        SELECT s.s_name, p.p_brand,
               ROUND(SUM(l.l_quantity), 4) AS total_qty,
               ROUND(SUM(l.l_quantity) * 100.0 / SUM(SUM(l.l_quantity)) OVER (PARTITION BY s.s_name), 6) AS brand_share_pct
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY s.s_name, p.p_brand
    """,
    tags=("join", "window-function", "agg"),
)
def q_supplier_part_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate + windowed share-of-total: each supplier's quantity mix
    across brands. supplier/part join UNHINTED — both scale linearly
    with SF (unlike nation/region), so threshold/AQE broadcasts while
    they fit and degrades to shuffle joins at the 100 TB target
    (review finding); the window reuses the group-by output (no extra
    wide shuffle of the fact)."""
    from pyspark.sql.window import Window

    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    p = load_table(spark, sf_dir, "part")
    grouped = (
        l.join(s, l["l_suppkey"] == s["s_suppkey"])
        .join(p, l["l_partkey"] == p["p_partkey"])
        .groupBy("s_name", "p_brand")
        .agg(F.sum("l_quantity").alias("raw_qty"))
    )
    w = Window.partitionBy("s_name")
    return grouped.select(
        "s_name",
        "p_brand",
        F.round(F.col("raw_qty"), 4).alias("total_qty"),
        F.round(F.col("raw_qty") * 100.0 / F.sum("raw_qty").over(w), 6).alias(
            "brand_share_pct"
        ),
    )
