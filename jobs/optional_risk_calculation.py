#!/usr/bin/env python
"""Per-customer risk aggregation job — the reference shipped this as an
EMPTY import stub (`sparkpyoptionalriskcalculation.py:1-9`, launcher
submit-optional-calculate-score.sh); this is its evident intent
realized: running per-customer score aggregates gated on ≥4
assessments (README.md:96), emitted in update mode.

Usage:
  spark-submit --packages org.apache.spark:spark-sql-kafka-0-10_2.13:4.0.0 \
      jobs/optional_risk_calculation.py [bootstrap_servers]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from evaluate_human_balance_with_spark_streaming_spark.plans.stedi import parse_risk_events
from evaluate_human_balance_with_spark_streaming_spark.session import get_spark
from evaluate_human_balance_with_spark_streaming_spark.sources.kafka import read_kafka_stream
from evaluate_human_balance_with_spark_streaming_spark.streaming.aggregates import (
    risk_score_per_customer,
)
from evaluate_human_balance_with_spark_streaming_spark.streaming.runner import (
    await_any,
    start_query,
)


def main() -> None:
    bootstrap = sys.argv[1] if len(sys.argv) > 1 else "localhost:9092"
    spark = get_spark("ehb-risk-calculation")
    raw = read_kafka_stream(spark, "stedi-events", bootstrap)
    scores = risk_score_per_customer(parse_risk_events(raw))
    start_query(
        scores,
        "console",
        checkpoint_location=tempfile.mkdtemp(prefix="stedi-risk-calc-"),
        output_mode="update",
    )
    await_any(spark)


if __name__ == "__main__":
    main()
