"""File-based sources: batch parquet plus streaming file sources used to
test the streaming pipelines without a Kafka broker."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_csv(
    spark: SparkSession, path: str, schema: StructType, header: bool = True
) -> DataFrame:
    """Batch CSV with an explicit schema (never inferSchema — schema
    inference is an extra full scan and nondeterministic typing)."""
    return spark.read.schema(schema).option("header", str(header).lower()).csv(path)


def read_json(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """Batch JSON-lines with an explicit schema; malformed rows null out
    (PERMISSIVE), matching the decode chain's tolerance."""
    return spark.read.schema(schema).json(path)


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
