"""Adapters from the driver's synthetic star-schema tables
(TESTDATA.md) to the STEDI wire shapes.

The decode-chain operators need `redis-server`-envelope and
`stedi-events`-payload inputs, but the provided test tables are plain
relational parquet. These adapters derive deterministic STEDI-shaped
rows from them with expressions that exist identically in Spark SQL and
DuckDB, so every derivation is oracle-checkable:

- email     = 'customer_' || lpad(c_custkey, 9, '0') || '@example.com'
- birthDay  = (1920 + c_custkey % 80) || '-01-' || lpad(c_custkey%28+1)
- risk rows = events table with the same email formula over user_id

`user_id` values are a subset of `c_custkey` values at every scale
factor, so the flagship inner join is non-empty by construction.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.partitioning import ensure_min_partitions

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # events.ts is TIMESTAMP(NANOS) parquet, surfaced as int64 nanos via
    # spark.sql.legacy.parquet.nanosAsLong (session.RUNTIME_CONF);
    # convert to a microsecond TimestampType column. Integer `div`, not
    # `/ 1000`: float division routes the int64 through a double, which
    # can't represent every nanos value — measured 22/1000 events at
    # sf0.001 landing 1µs early (e.g. ...026000000 ns → ...025999 µs),
    # off-by-a-millisecond once rendered in the SSS wire format.
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def _email_from_custkey(key_col):
    return F.concat(
        F.lit("customer_"), F.lpad(key_col.cast("string"), 9, "0"), F.lit("@example.com")
    )


def stedi_customers_plain(
    spark: SparkSession, sf_dir: str, with_ts: bool = False,
    keep_key: bool = False,
) -> DataFrame:
    """Customer table → plain STEDI customer records (pre-encoding).

    ``keep_key`` appends ``_custkey`` (the raw c_custkey) for callers
    that gate rows on the key (null-filter / corruption fixtures) —
    single-sourced here so no caller re-derives it with a per-row
    regexp over customerName.

    ``with_ts`` appends the ``cust_ts`` event-time column used by the
    watermarked flagship variant (the Kafka-record-timestamp shape):
    customers spread deterministically across the events table's
    January-2024 span — epoch 1704067200 (2024-01-01 UTC) +
    (custkey % 30) days + (custkey % 86400) seconds. (The % 86400
    matters: at sf <= 0.1 custkey < 86400 so a bare `+ custkey` oracle
    would PASS the gate and then silently diverge at sf1+.) Single
    source for the
    email/phone/birthDay formulas that the oracle SQL fragments
    (plans/stedi_queries.py) replay."""
    # r16 re-measure: the round-1 finding that spreading this scan was
    # a net loss no longer holds once the decode chain is evaluated
    # once per row (stedi.py's Generate barrier): the sf0.1 customer
    # file is one ~300 KB scan task, so the whole encode+decode chain
    # ran on ONE core (~0.9 s single-threaded) while a round-robin
    # spread of the slim pre-encode rows costs ~0.1 s. At cluster
    # scale the helper no-ops (big files already split); locally it
    # parallelizes the JSON hot loop across the session width.
    c = ensure_min_partitions(load_table(spark, sf_dir, "customer"))
    k = F.col("c_custkey")
    birth_year = (F.lit(1920) + k % 80).cast("int").cast("string")
    birth_day = F.concat(
        birth_year,
        F.lit("-01-"),
        F.lpad((k % 28 + 1).cast("string"), 2, "0"),
    )
    cols = [
        F.col("c_name").alias("customerName"),
        _email_from_custkey(k).alias("email"),
        F.concat(F.lit("555"), F.lpad((k % 10000).cast("string"), 4, "0")).alias(
            "phone"
        ),
        birth_day.alias("birthDay"),
    ]
    if with_ts:
        cols.append(
            F.timestamp_seconds(
                F.lit(1704067200).cast("long") + (k % 30) * 86400 + (k % 86400)
            ).alias("cust_ts")
        )
    if keep_key:
        cols.append(k.alias("_custkey"))
    return c.select(*cols)


def stedi_risk_plain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events table → plain STEDI risk assessments (pre-encoding).

    Spread like stedi_customers_plain: the sf0.1 events file is one
    ~2 MB scan task, so the 100k-row to_json/from_json hot loop
    otherwise runs on one core; no-ops at cluster scale."""
    e = ensure_min_partitions(load_table(spark, sf_dir, "events"))
    return e.select(
        _email_from_custkey(F.col("user_id")).alias("customer"),
        F.col("value").cast("float").alias("score"),
        F.col("ts").alias("riskDate"),
    )


def stedi_customers_wire(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer table → doubly-encoded `redis-server` envelopes
    (single `value` string column)."""
    from ..plans.stedi import encode_customer_envelope

    return encode_customer_envelope(stedi_customers_plain(spark, sf_dir))


def stedi_customers_wire_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer wire envelopes WITH the ``cust_ts`` event-time side
    column (see stedi_customers_plain) — used by the watermarked
    flagship variant."""
    from ..plans.stedi import encode_customer_envelope

    plain = stedi_customers_plain(spark, sf_dir, with_ts=True)
    return encode_customer_envelope(plain, keep_cols=("cust_ts",))


def stedi_risk_wire(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events table → `stedi-events` JSON payloads
    (single `value` string column)."""
    from ..plans.stedi import encode_risk_event

    return encode_risk_event(stedi_risk_plain(spark, sf_dir))
