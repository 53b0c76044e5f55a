"""File-based sources: batch parquet plus streaming file sources used to
test the streaming pipelines without a Kafka broker."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def stream_parquet_dir(
    spark: SparkSession, path: str, schema: StructType, max_files_per_trigger: int = 1
) -> DataFrame:
    """Treat a directory of parquet files as a stream (one micro-batch
    per file by default) — the standard broker-free integration-test
    source; combined with trigger(availableNow=True) it drains the
    directory and stops."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(path)
    )


def stream_json_dir(
    spark: SparkSession, path: str, schema: StructType, max_files_per_trigger: int = 1
) -> DataFrame:
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .json(path)
    )
