"""Partitioning discipline helpers.

Spark sizes scan partitions by bytes (spark.sql.files.maxPartitionBytes),
which is right for scan-bound work but wrong for CPU-heavy per-row
expressions over *small-bytes* inputs: a 5 MB parquet file arrives as
one partition and a 16-hash MinHash sweep runs on one core. These
helpers spread such stages without penalizing already-parallel inputs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

# Mirrors the spark.sql.files.maxPartitionBytes default (128 MB): used
# only to ESTIMATE how many scan tasks large files will split into, so
# a few-big-files input is not misread as few-partitions (which would
# buy a pointless full shuffle of an already-parallel scan).
_SPLIT_BYTES = 128 << 20


def _estimated_scan_parallelism(df: DataFrame) -> int | None:
    """Estimate the scan parallelism of ``df`` from FILE METADATA only
    — ``inputFiles()`` resolves the logical plan's file index but never
    builds the physical plan or an RDD (VERDICT r03 item 6: the old
    ``df.rdd.getNumPartitions()`` probe forced driver-side physical
    planning of the upstream plan on every operator build). Each input
    file contributes at least one task plus one per 128 MB of splits
    (sizes are read for local files; remote files conservatively count
    once, which at worst repartitions an input that was already
    parallel enough). None when the plan has no file scan to estimate
    (in-memory test data, post-shuffle inputs)."""
    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    est = len(files)
    for f in files:
        if f.startswith("file:"):
            try:
                est += os.path.getsize(f.removeprefix("file:")) // _SPLIT_BYTES
            except OSError:
                pass
    return est


def ensure_min_partitions(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition up to ``min_partitions`` (default: the
    session's default parallelism) iff the DataFrame's file scan would
    produce fewer tasks. No-op — no added shuffle — when the input is
    already at least that parallel, so it is safe to leave in scale
    paths. The check is plan-build-light: file metadata, never an RDD
    conversion (asserted by tests/test_plan_shapes.py)."""
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    est = _estimated_scan_parallelism(df)
    if est is None or est < target:
        return df.repartition(target)
    return df
