"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``evaluate_human_balance_with_spark_streaming_spark``
package; queries and their oracles are registered side by side in
plans/registry.py so they can't drift apart.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from evaluate_human_balance_with_spark_streaming_spark.plans import registry
from evaluate_human_balance_with_spark_streaming_spark.session import (
    apply_runtime_conf,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's full
    dataflow (SURVEY §3) — doubly-encoded redis envelopes and risk-event
    JSON synthesized from the test tables, decoded through the
    base64/from_json chain, inner-joined on email = customer."""
    from evaluate_human_balance_with_spark_streaming_spark.plans.stedi import (
        flagship_pipeline,
    )
    from evaluate_human_balance_with_spark_streaming_spark.sources.testdata import (
        stedi_customers_wire,
        stedi_risk_wire,
    )

    apply_runtime_conf(spark)
    sf_dir = "/root/testdata/sf0.001"
    return flagship_pipeline(
        stedi_customers_wire(spark, sf_dir), stedi_risk_wire(spark, sf_dir)
    )


def _wrap(fn: registry.QueryFn) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from evaluate_human_balance_with_spark_streaming_spark.caching import (
            release_managed,
        )

        # Free persist barriers left by the PREVIOUS (already-evaluated)
        # query so caches don't accumulate across a 50-query session.
        release_managed()
        apply_runtime_conf(spark)
        return fn(spark, sf_dir)

    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 plus the
    extension suites (dedup / similarity / text / multimodal /
    streaming). Column aliases match ``oracle_sql`` exactly."""
    return {name: _wrap(fn) for name, fn in registry.all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for EVERY query — no omissions as
    of round 3 (the stateful streaming query collapses its per-batch
    update emission to final state, which is relational); even the
    pandas-UDF multimodal pass has a byte-exact relational twin."""
    return registry.all_oracles()
