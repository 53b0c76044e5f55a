"""Reference-parity STEDI pipelines as pure transformations.

Each function is ``DataFrame -> DataFrame`` so the same plan runs on a
batch DataFrame (unit tests, DuckDB oracle) or a streaming DataFrame
(Kafka / file source) — Structured Streaming's core promise. The
reference interleaves DataFrame calls, temp views and ``spark.sql`` for
style (its own comment, reference sparkpykafkajoin.py:109-110); both
spellings build the same logical plan, so we keep the declarative
DataFrame form throughout.

Pipeline map (reference file:line → function here):

- cast value → string               (sparkpykafkajoin.py:72)      decode_customers
- from_json envelope + star-expand  (sparkpykafkajoin.py:105-107) decode_customers
- zSetEntries[0].element            (sparkpykafkajoin.py:111-113) decode_customers
- unbase64 → string                 (sparkpykafkajoin.py:121-123) decode_customers
- from_json customer + star-expand  (sparkpykafkajoin.py:133-135) decode_customers
- email/birthDay not-null filter    (sparkpykafkajoin.py:138-149) select_email_birth_year
- birthYear = split(birthDay,'-')[0](sparkpykafkajoin.py:152-154) select_email_birth_year
- risk cast + parse + project       (sparkpykafkajoin.py:167-193) parse_risk_events
- inner equi-join email = customer  (sparkpykafkajoin.py:196-198) join_risk_with_customers
- to_json(struct(*)) AS value       (sparkpykafkajoin.py:211-212) serialize_for_kafka
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import CUSTOMER_SCHEMA, REDIS_SCHEMA, STEDI_SCHEMA, STEDI_SCHEMA_TS


def decode_customers(
    raw: DataFrame, value_col: str = "value", passthrough: tuple[str, ...] = ()
) -> DataFrame:
    """Decode the doubly-encoded Redis change feed into customer rows.

    Input: one column (default ``value``, binary or string) holding the
    JSON envelope from the ``redis-server`` topic. Output: the parsed
    inner customer document columns (customer, email, phone, birthDay),
    where ``customer`` is null by the reference's schema-mismatch quirk.

    Chain (reference sparkpykafkajoin.py:72-135): cast → from_json with
    the envelope schema → take ``zSetEntries[0].element`` → unbase64 →
    from_json with the customer schema → star-expand. Malformed base64
    or JSON yields nulls (from_json PERMISSIVE mode), never a crash; the
    downstream not-null filter drops them.

    The final customer struct is materialized through an
    ``explode(array(...))`` Generate barrier (r16 optimization, guide
    §4.4's duplicated-evaluation pattern): Catalyst pushes the
    downstream not-null/join-key filters below the decode projections
    and INLINES the whole double-JSON+base64 chain into the Filter
    condition, so every surviving row paid the decode twice (once in
    the pushed Filter, once in the Project — visible in
    plans/r16/stedi_decode_chain_before.txt node (3)). A predicate on a
    generator's OUTPUT attribute cannot be pushed below the Generate,
    so the chain is evaluated exactly once per row and the filters
    become cheap struct-field references. explode(array(x)) emits
    exactly one row per input row (even when x is null), so row
    semantics are byte-identical; streaming-safe (stateless generator).
    """
    carry = [F.col(c) for c in passthrough]
    envelope = raw.select(
        *carry,
        F.from_json(F.col(value_col).cast("string"), REDIS_SCHEMA).alias("env"),
    ).select(*passthrough, "env.*")
    # F.get (not getItem): under ANSI mode (Spark 4 default) [0] on an
    # empty zSetEntries array would throw and kill the stream; get()
    # yields null, which the downstream not-null filter drops — the
    # reference's non-ANSI Spark 3.1 tolerance, preserved explicitly.
    encoded = envelope.select(
        *carry,
        F.get(F.col("zSetEntries"), 0).getField("element").alias("encodedCustomer"),
    )
    # try_to_binary: malformed base64 → null instead of an ANSI error.
    decoded = encoded.select(
        *carry,
        F.try_to_binary(F.col("encodedCustomer"), F.lit("base64"))
        .cast("string")
        .alias("customerJson"),
    )
    return decoded.select(
        *carry,
        F.explode(
            F.array(F.from_json(F.col("customerJson"), CUSTOMER_SCHEMA))
        ).alias("customer"),
    ).select(*passthrough, "customer.*")


def select_email_birth_year(
    customers: DataFrame, extra_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Not-null filter + birth-year derivation + projection.

    Missing JSON fields parse to null (reference comment
    sparkpykafkajoin.py:137); rows without email or birthDay are dropped
    (sparkpykafkajoin.py:138-149). ``birthYear`` is the string before
    the first '-' — the reference extracts it by string split, not date
    functions (sparkpykafkajoin.py:152-154), so the output type is a
    plain string and we preserve that.
    """
    return (
        customers.filter(F.col("email").isNotNull() & F.col("birthDay").isNotNull())
        .withColumn("birthYear", F.split(F.col("birthDay"), "-").getItem(0))
        .select("email", "birthYear", *extra_cols)
    )


def customer_pipeline(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """Full customer branch: decode chain → (email, birthYear)."""
    return select_email_birth_year(decode_customers(raw, value_col))


def parse_risk_events(
    raw: DataFrame, value_col: str = "value", keep_timestamp: bool = False
) -> DataFrame:
    """Parse the single-encoded ``stedi-events`` JSON stream.

    Output: (customer, score) — the reference's projection
    (sparkpykafkajoin.py:193). With ``keep_timestamp`` the riskDate is
    retained as a proper TimestampType for watermarked aggregates.
    """
    schema = STEDI_SCHEMA_TS if keep_timestamp else STEDI_SCHEMA
    # Same explode(array(...)) single-evaluation barrier as
    # decode_customers: the flagship join infers isnotnull(customer) on
    # the join key and pushes it below this projection with the full
    # from_json inlined (plans/r16/stedi_flagship_join_before.txt node
    # (2)) — the Generate pins the parse to once per row.
    parsed = raw.select(
        F.explode(
            F.array(F.from_json(F.col(value_col).cast("string"), schema))
        ).alias("event")
    ).select("event.*")
    if keep_timestamp:
        return parsed.select("customer", "score", "riskDate")
    return parsed.select("customer", "score")


def join_risk_with_customers(risk: DataFrame, customers: DataFrame) -> DataFrame:
    """Flagship inner equi-join: risk.customer = customers.email.

    Reference sparkpykafkajoin.py:196-198 (``expr("email = customer")``).
    Semantics preserved: duplicate emails multiply (each re-save of a
    customer joins every matching risk event) and risk events with no
    matching customer are dropped. On streams Spark plans a
    StreamingSymmetricHashJoin with unbounded state (no watermark in
    parity mode); on batch, an ordinary equi-join that AQE/broadcast
    planning is free to optimize.

    Output columns: customer, score, email, birthYear
    (reference sparkpykafkajoin.py:200-209).
    """
    return risk.join(customers, risk["customer"] == customers["email"], "inner").select(
        "customer", "score", "email", "birthYear"
    )


def decode_customers_with_time(
    raw: DataFrame, value_col: str = "value", ts_col: str = "cust_ts"
) -> DataFrame:
    """The customer decode chain with an event-time column carried
    through every step (the Kafka-record-timestamp pattern: the wire
    carries (value, ts); ts survives the decode untouched so watermarks
    can bound state downstream). ONE decode chain, parameterized — a
    second copy would have to receive every ANSI-tolerance fix (F.get,
    try_to_binary) in lockstep or silently diverge."""
    return decode_customers(raw, value_col, passthrough=(ts_col,))


def flagship_pipeline_watermarked(
    redis_raw: DataFrame,
    events_raw: DataFrame,
    ts_col: str = "cust_ts",
    watermark: str = "40 days",
    band_days: int = 15,
) -> DataFrame:
    """The PRODUCTION variant of the flagship join: both sides carry
    event time, both declare watermarks, and the join condition is
    time-bounded — so Spark plans state EVICTION for the
    StreamingSymmetricHashJoin instead of the reference's unbounded
    state (reference sparkpykafkajoin.py:196-198 joins with no
    watermark; its state grows forever).

    State bound: a customer row is kept only until the risk-side
    watermark passes ``cust_ts + band_days`` (and vice versa) — state
    size becomes O(rows in the band window), not O(all history).
    The default ``watermark`` delay is wide so bounded replays emit
    every in-band match deterministically; production tightens it to
    the real late-data tolerance.
    """
    cust = select_email_birth_year(
        decode_customers_with_time(redis_raw, ts_col=ts_col), extra_cols=(ts_col,)
    )
    risk = parse_risk_events(events_raw, keep_timestamp=True)
    if cust.isStreaming:
        cust = cust.withWatermark(ts_col, watermark)
    if risk.isStreaming:
        risk = risk.withWatermark("riskDate", watermark)
    band = (
        F.col("riskDate")
        >= F.col(ts_col) - F.expr(f"INTERVAL {band_days} DAYS")
    ) & (
        F.col("riskDate")
        <= F.col(ts_col) + F.expr(f"INTERVAL {band_days} DAYS")
    )
    joined = risk.join(
        cust, (risk["customer"] == cust["email"]) & band, "inner"
    )
    return joined.select("customer", "score", "email", "birthYear")


def serialize_for_kafka(df: DataFrame) -> DataFrame:
    """``to_json(struct(*)) AS value`` — the Kafka sink projection
    (reference sparkpykafkajoin.py:211-212; target payload
    README.md:159-164)."""
    return df.select(F.to_json(F.struct(*df.columns)).alias("value"))


def serialize_risk_payload(df: DataFrame) -> DataFrame:
    """The CERTIFIED sink projection for the flagship join output:
    score serialized as a JSON *string* to match the documented target
    payload (reference README.md:159-164), then to_json(struct(*)).
    ONE definition in front of both the production job
    (jobs/kafka_join.py) and the driver-certified stedi_serialized_sink
    query — the job previously called bare serialize_for_kafka and
    emitted score as a JSON number, drifting from the payload the
    certification covers."""
    return serialize_for_kafka(
        df.select(
            F.col("customer"),
            F.col("score").cast("string").alias("score"),
            F.col("email"),
            F.col("birthYear"),
        )
    )


def flagship_pipeline(redis_raw: DataFrame, events_raw: DataFrame) -> DataFrame:
    """The complete flagship dataflow, unserialized: two raw streams in,
    joined (customer, score, email, birthYear) out."""
    customers = customer_pipeline(redis_raw)
    risk = parse_risk_events(events_raw)
    return join_risk_with_customers(risk, customers)


# ---------------------------------------------------------------------------
# Encoders: the inverse chain, used to synthesize wire-format fixtures
# from plain relational rows (and by `entry()` to exercise the decode
# chain end-to-end on the test tables). Built from the same Spark
# primitives (to_json/base64), so encode∘decode is the identity the
# tests and the DuckDB oracle rely on.
# ---------------------------------------------------------------------------


def encode_customer_envelope(
    customers: DataFrame,
    name_col: str = "customerName",
    email_col: str = "email",
    phone_col: str = "phone",
    birth_day_col: str = "birthDay",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Wrap plain customer rows into the doubly-encoded `redis-server`
    envelope (single `value` string column), matching README.md:55-92:
    inner JSON uses the wire field name ``customerName`` (which the
    decode schema deliberately nulls out), base64-wrapped inside
    zSetEntries[0].element, with the redundant twin ``zsetEntries``."""
    inner = F.to_json(
        F.struct(
            F.col(name_col).alias("customerName"),
            F.col(email_col).alias("email"),
            F.col(phone_col).alias("phone"),
            F.col(birth_day_col).alias("birthDay"),
        )
    )
    # ch and score are TYPED on the wire (JSON boolean false / number
    # 0.0) exactly as the reference's README documents, while the
    # decode schema declares both as string — so every synthesized
    # fixture actually EXERCISES the boolean→"false" / number→"0.0"
    # from_json coercion quirk the schemas module pins, instead of
    # bypassing it with pre-stringified values.
    entry = F.struct(
        F.base64(inner.cast("binary")).alias("element"),
        F.lit(0.0).alias("score"),
    )
    envelope = F.struct(
        F.base64(F.lit("Customer").cast("binary")).alias("key"),
        F.lit("NONE").alias("existType"),
        F.lit(False).alias("ch"),
        F.lit(False).alias("incr"),
        F.array(entry).alias("zSetEntries"),
        F.array(entry).alias("zsetEntries"),  # redundant twin, README.md:69-72
    )
    return customers.select(
        F.to_json(envelope).alias("value"), *[F.col(c) for c in keep_cols]
    )


def encode_risk_event(
    events: DataFrame,
    customer_col: str = "customer",
    score_col: str = "score",
    risk_date_col: str = "riskDate",
) -> DataFrame:
    """Serialize plain risk rows into `stedi-events` JSON payloads
    (single `value` string column), matching README.md:98-103."""
    return events.select(
        F.to_json(
            F.struct(
                F.col(customer_col).alias("customer"),
                F.col(score_col).cast("float").alias("score"),
                F.date_format(
                    F.col(risk_date_col), "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"
                ).alias("riskDate"),
            )
        ).alias("value")
    )
