"""Reference-parity queries (SURVEY §2), oracle-checked on the driver's
synthetic tables.

The decode-chain inputs are the STEDI wire shapes synthesized
deterministically from `customer`/`events` (sources/testdata.py); since
the encoders use the same Spark primitives the decoders invert, the
DuckDB oracle is the *direct* relational derivation — any bug on either
side of the encode/decode chain breaks the hash match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.testdata import (
    stedi_customers_plain,
    stedi_customers_wire,
    stedi_risk_wire,
)
from . import stedi
from .registry import register

# Shared SQL fragments for the oracle side (DuckDB dialect == ANSI here).
_SQL_EMAIL_FROM_CUST = (
    "'customer_' || lpad(CAST(c_custkey AS VARCHAR), 9, '0') || '@example.com'"
)
_SQL_EMAIL_FROM_USER = (
    "'customer_' || lpad(CAST(user_id AS VARCHAR), 9, '0') || '@example.com'"
)
_SQL_BIRTH_YEAR = "CAST(1920 + c_custkey % 80 AS VARCHAR)"


@register(
    "stedi_decode_chain",
    oracle=f"""
        SELECT {_SQL_EMAIL_FROM_CUST} AS email,
               {_SQL_BIRTH_YEAR} AS birthYear
        FROM customer
    """,
    tags=("parity", "P1-P9"),
)
def stedi_decode_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full customer branch (reference sparkpykafkajoin.py:72-155):
    envelope JSON → from_json → zSetEntries[0].element → unbase64 →
    from_json → not-null filter → birthYear split → (email, birthYear)."""
    return stedi.customer_pipeline(stedi_customers_wire(spark, sf_dir))


@register(
    "stedi_risk_parse",
    oracle=f"""
        SELECT {_SQL_EMAIL_FROM_USER} AS customer,
               CAST(value AS FLOAT) AS score
        FROM events
    """,
    tags=("parity", "P1,P2,P3,P10"),
)
def stedi_risk_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Risk branch (reference sparkpyeventskafkastreamtoconsole.py:29-61):
    JSON payload → from_json(stediSchema) → (customer, score)."""
    return stedi.parse_risk_events(stedi_risk_wire(spark, sf_dir))


@register(
    "stedi_flagship_join",
    oracle=f"""
        WITH cust AS (
            SELECT {_SQL_EMAIL_FROM_CUST} AS email,
                   {_SQL_BIRTH_YEAR} AS birthYear
            FROM customer
        ),
        risk AS (
            SELECT {_SQL_EMAIL_FROM_USER} AS customer,
                   CAST(value AS FLOAT) AS score
            FROM events
        )
        SELECT r.customer, r.score, c.email, c.birthYear
        FROM risk r JOIN cust c ON r.customer = c.email
    """,
    tags=("parity", "J1"),
)
def stedi_flagship_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship (reference sparkpykafkajoin.py:196-209): decode both
    streams, inner equi-join risk.customer = customers.email, project
    (customer, score, email, birthYear)."""
    return stedi.flagship_pipeline(
        stedi_customers_wire(spark, sf_dir), stedi_risk_wire(spark, sf_dir)
    )


@register(
    "stedi_null_filter",
    oracle=f"""
        SELECT {_SQL_EMAIL_FROM_CUST} AS email,
               {_SQL_BIRTH_YEAR} AS birthYear
        FROM customer
        WHERE c_custkey % 10 <> 0
    """,
    tags=("parity", "P7"),
)
def stedi_null_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Not-null filter semantics (reference sparkpykafkajoin.py:138-149):
    missing JSON fields parse to null and are dropped. Every 10th
    customer's email field is omitted from the inner document
    (to_json drops null fields), so the decode output must exclude it."""
    plain = stedi_customers_plain(spark, sf_dir, keep_key=True)
    # Null out the email for customers whose key is divisible by 10;
    # the key comes from the source (keep_key), not a per-row regexp.
    plain = plain.withColumn(
        "email", F.when(F.col("_custkey") % 10 != 0, F.col("email"))
    ).drop("_custkey")
    return stedi.customer_pipeline(stedi.encode_customer_envelope(plain))


@register(
    "stedi_serialized_sink",
    oracle=f"""
        WITH cust AS (
            SELECT {_SQL_EMAIL_FROM_CUST} AS email,
                   {_SQL_BIRTH_YEAR} AS birthYear
            FROM customer
        ),
        risk AS (
            SELECT {_SQL_EMAIL_FROM_USER} AS customer,
                   CAST(value AS FLOAT) AS score
            FROM events
        )
        SELECT '{{"customer":"' || r.customer || '"'
               || CASE WHEN r.score IS NULL THEN ''
                       ELSE ',"score":"' || CAST(r.score AS VARCHAR) || '"' END
               || ',"email":"' || c.email || '"'
               || CASE WHEN c.birthYear IS NULL THEN ''
                       ELSE ',"birthYear":"' || c.birthYear || '"' END
               || '}}'
               AS value
        FROM risk r JOIN cust c ON r.customer = c.email
    """,
    tags=("parity", "P11,K1"),
)
def stedi_serialized_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kafka-sink projection (reference sparkpykafkajoin.py:211-212):
    to_json(struct(*)) AS value, via the SAME serialize_risk_payload
    the production job publishes (score as a JSON string per the
    documented target payload, README.md:159-164 — which also makes
    the oracle's formatting deterministic). The oracle replays
    to_json's null-field DROPPING for the nullable fields (score,
    birthYear): naive string concatenation would NULL the whole
    payload on one null field — same row count, hash mismatch — the
    moment a regenerated fixture contains a null score. customer and
    email are inner-join keys, never null here."""
    return stedi.serialize_risk_payload(
        stedi.flagship_pipeline(
            stedi_customers_wire(spark, sf_dir), stedi_risk_wire(spark, sf_dir)
        )
    )


@register(
    "stedi_flagship_sql",
    oracle=f"""
        WITH cust AS (
            SELECT {_SQL_EMAIL_FROM_CUST} AS email,
                   {_SQL_BIRTH_YEAR} AS birthYear
            FROM customer
        ),
        risk AS (
            SELECT {_SQL_EMAIL_FROM_USER} AS customer,
                   CAST(value AS FLOAT) AS score
            FROM events
        )
        SELECT r.customer, r.score, c.email, c.birthYear
        FROM risk r JOIN cust c ON r.customer = c.email
    """,
    tags=("parity", "J1", "P12", "sql-style"),
)
def stedi_flagship_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship dataflow written the way the REFERENCE writes it —
    temp views + spark.sql at every step (reference
    sparkpykafkajoin.py:105-198 alternates the two styles; its comment
    at :109-110 says SQL is used 'because it's easier'). Both spellings
    build the same logical plan through the session catalog; this query
    proves the SQL surface end-to-end with the same oracle as the
    DataFrame-style flagship."""
    stedi_customers_wire(spark, sf_dir).createOrReplaceTempView("RedisWire")
    stedi_risk_wire(spark, sf_dir).createOrReplaceTempView("EventsWire")
    spark.sql(
        """
        SELECT from_json(CAST(value AS STRING),
                         'key string, existType string, ch string, incr boolean,
                          zSetEntries array<struct<element:string, score:string>>'
               ) AS env
        FROM RedisWire
        """
    ).selectExpr("env.*").createOrReplaceTempView("RedisSortedSet")
    spark.sql(
        "SELECT get(zSetEntries, 0).element AS encodedCustomer FROM RedisSortedSet"
    ).createOrReplaceTempView("EncodedCustomer")
    spark.sql(
        """
        SELECT from_json(
                   CAST(try_to_binary(encodedCustomer, 'base64') AS STRING),
                   'customer string, email string, phone string, birthDay string'
               ) AS customer
        FROM EncodedCustomer
        """
    ).selectExpr("customer.*").createOrReplaceTempView("CustomerRecords")
    spark.sql(
        """
        SELECT email, split(birthDay, '-')[0] AS birthYear
        FROM CustomerRecords
        WHERE email IS NOT NULL AND birthDay IS NOT NULL
        """
    ).createOrReplaceTempView("EmailAndBirthYear")
    spark.sql(
        """
        SELECT event.customer AS customer, event.score AS score
        FROM (
            SELECT from_json(CAST(value AS STRING),
                             'customer string, score float, riskDate date') AS event
            FROM EventsWire
        )
        """
    ).createOrReplaceTempView("CustomerRisk")
    out = spark.sql(
        """
        SELECT customer, score, email, birthYear
        FROM CustomerRisk JOIN EmailAndBirthYear ON customer = email
        """
    )
    # spark.sql analyzes eagerly, so the returned plan no longer needs
    # the views — drop them before returning. Leaving seven
    # generically-named views (CustomerRisk, ...) in the SHARED session
    # catalog would let any later query that uses one of these common
    # names silently read a stale plan bound to this invocation's
    # sf_dir instead of failing.
    for v in (
        "RedisWire", "EventsWire", "RedisSortedSet", "EncodedCustomer",
        "CustomerRecords", "EmailAndBirthYear", "CustomerRisk",
    ):
        spark.catalog.dropTempView(v)
    return out


@register(
    "stedi_corruption_accounting",
    oracle="""
        SELECT COUNT(*) AS wire_rows,
               CAST(SUM(CASE WHEN c_custkey % 7 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS decoded_rows,
               CAST(SUM(CASE WHEN c_custkey % 7 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS corrupt_rows
        FROM customer
    """,
    tags=("parity", "data-quality"),
)
def stedi_corruption_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality accounting through the decode chain: every 7th
    customer's envelope is replaced with a non-JSON payload before
    decoding. PERMISSIVE from_json + try_to_binary turn corruption into
    nulls (never a crashed stream — the SURVEY §7 hard requirement);
    this query proves the engine also COUNTS what it dropped, because
    silent data loss at 100 TB is unfindable after the fact."""
    # Deterministically corrupt every 7th record, keyed on the custkey
    # AT ENCODE TIME (carried through the encoder via keep_cols) —
    # recovering the key from the encoded wire itself would cost an
    # extra unbase64 + get_json_object + regexp pass per row before the
    # decode chain even starts (measured ~2× this query at sf0.1).
    plain = stedi_customers_plain(spark, sf_dir, keep_key=True)
    wire = stedi.encode_customer_envelope(
        plain.withColumnRenamed("_custkey", "_ck"), keep_cols=("_ck",)
    )
    corrupted_wire = wire.select(
        F.when(
            F.col("_ck") % 7 == 0,
            F.concat(F.lit("corrupt!"), F.col("_ck").cast("string")),
        )
        .otherwise(F.col("value"))
        .alias("value")
    )
    # decode WITHOUT the not-null filter, then one aggregation pass:
    # corruption nulls out every decoded field, so count(email) counts
    # the survivors and the difference is the drop tally.
    decoded = stedi.decode_customers(corrupted_wire)
    return decoded.agg(
        F.count(F.lit(1)).alias("wire_rows"),
        F.count("email").alias("decoded_rows"),
        (F.count(F.lit(1)) - F.count("email")).alias("corrupt_rows"),
    )
