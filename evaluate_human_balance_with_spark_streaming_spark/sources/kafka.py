"""Kafka stream source/sink bindings.

Mirrors the reference's source options (reference
sparkpykafkajoin.py:63-69: subscribe + ``startingOffsets=earliest`` to
replay the full topic) and sink options (sparkpykafkajoin.py:212-218:
append mode, explicit checkpoint). Requires the spark-sql-kafka package
on the classpath; in this repo's test environment there is no broker,
so these bindings are exercised only for plan construction — the
transformation logic itself is tested through file/memory sources.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_kafka_stream(
    spark: SparkSession,
    topic: str,
    bootstrap_servers: str = "localhost:9092",
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """Subscribe to a topic as a streaming DataFrame.

    ``maxOffsetsPerTrigger`` bounds micro-batch size — on a large topic
    an unbounded first batch (earliest replay) is the classic OOM; the
    reference leaves it unset because its topics are tiny.
    """
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    return reader.load()


def kafka_sink_options(
    topic: str,
    bootstrap_servers: str = "localhost:9092",
) -> dict[str, str]:
    """Options for a Kafka ``writeStream`` (append mode, at-least-once
    delivery — same contract as the reference sink,
    sparkpykafkajoin.py:212-218). Deliberately does NOT include
    checkpointLocation: start_query owns the checkpoint (options are
    applied after it, so a dict entry would silently override the
    caller's explicit checkpoint_location argument)."""
    return {
        "kafka.bootstrap.servers": bootstrap_servers,
        "topic": topic,
    }
