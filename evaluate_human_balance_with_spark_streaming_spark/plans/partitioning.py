"""Partitioning discipline helpers.

Spark sizes scan partitions by bytes (spark.sql.files.maxPartitionBytes),
which is right for scan-bound work but wrong for CPU-heavy per-row
expressions over *small-bytes* inputs: a 5 MB parquet file arrives as
one partition and a 16-hash MinHash sweep runs on one core. These
helpers spread such stages without penalizing already-parallel inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_partitions(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition up to ``min_partitions`` (default: the
    session's default parallelism) iff the DataFrame currently has
    fewer. No-op — no added shuffle — when the input is already at
    least that parallel, so it is safe to leave in scale paths."""
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
