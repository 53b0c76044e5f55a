"""Watermarked streaming aggregates — the realized intent of the
reference's two empty stubs (risk-score calculation and risk-quality
aggregation, reference sparkpyoptionalriskcalculation.py:1-9 /
sparkpyoptionalriskquality.py:1-3), with the late-data semantics the
reference never chose: a configurable watermark (default 10 minutes)
bounding state.

Same transformations run on batch DataFrames (withWatermark is a no-op
on batch), which is how the DuckDB oracle certifies them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_quality(
    events: DataFrame,
    ts_col: str = "ts",
    window_size: str = "1 day",
    watermark: str | None = "10 minutes",
    extra_aggs: tuple = (),
) -> DataFrame:
    """Tumbling-window event-quality aggregate keyed by event type.

    Streaming state is bounded: windows older than (max event time −
    watermark) finalize and evict. Deliberately NO distinct-count in
    the default aggregates: exact distinct needs unbounded per-window
    sets in streaming state (use approx_count_distinct/HLL at 100 TB
    if needed). ``extra_aggs`` (aliased Columns) lets the batch twin
    (plans/analytics.py::q_windowed_quality) ADD the exact
    countDistinct while running THIS code — one definition in front
    of both oracles instead of a re-implementation that could drift.
    """
    src = events
    if watermark and events.isStreaming:
        src = events.withWatermark(ts_col, watermark)
    out = src.groupBy(
        F.window(ts_col, window_size).alias("w"), F.col("event_type")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        # Exact decimal sum → one double division: order-independent
        # (incremental state merge order varies batch to batch).
        F.round(
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("avg_value"),
        *extra_aggs,
    )
    return out.select(
        F.date_format("w.start", "yyyy-MM-dd").alias("window_day"),
        *[c for c in out.columns if c != "w"],
    )


def risk_score_per_customer(
    risk: DataFrame,
    customer_col: str = "customer",
    score_col: str = "score",
    min_assessments: int = 4,
) -> DataFrame:
    """Per-customer running risk aggregate, gated on ≥N assessments
    (README.md:96: scores appear after four tests). On a stream this is
    a complete/update-mode aggregate; state is one row per customer.

    ``n_assessments`` counts NON-NULL scores — the same definition as
    the stateful twin (stateful.py::running_risk_state) and the
    COUNT(value) oracle that certifies it. A malformed payload parses
    to a null score (parse_risk_events' PERMISSIVE tolerance);
    counting it would let a customer with four malformed payloads and
    zero real assessments pass the gate and emit an all-null
    aggregate row."""
    return (
        risk.groupBy(customer_col)
        .agg(
            F.count(F.col(score_col)).alias("n_assessments"),
            # Exact decimal sum → one double division (same
            # order-independence discipline as windowed_quality above):
            # F.avg over doubles accumulates in state-merge order, which
            # varies batch to batch on a stream, so identical input
            # could emit avg values differing in the last bits.
            # Divide by the NON-NULL count — avg semantics, null scores
            # ignored (decimal sum skips them too).
            F.round(
                F.sum(F.col(score_col).cast("decimal(28,6)")).cast("double")
                / F.count(F.col(score_col)),
                6,
            ).alias("avg_score"),
            F.round(F.min(score_col), 6).alias("min_score"),
            F.round(F.max(score_col), 6).alias("max_score"),
        )
        .filter(F.col("n_assessments") >= min_assessments)
    )
