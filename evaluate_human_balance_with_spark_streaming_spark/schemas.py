"""Declared schemas for the STEDI streams — the reference's exact
StructTypes, quirks preserved on purpose.

The reference hand-declares every schema (no inference; reference
sparkpykafkajoin.py:15-53) and its declarations deliberately diverge
from the wire payloads in three places we must reproduce because the
divergences shape the output:

1. ``ch`` is declared String though the payload is boolean ``false``
   (reference sparkpykafkajoin.py:20 vs README.md:63) — ``from_json``
   coerces.
2. ``zSetEntries[*].score`` is declared String though the payload is a
   number (reference sparkpykafkajoin.py:22-32 vs README.md:67).
3. The inner customer schema declares ``customer`` but the wire field is
   ``customerName`` (reference sparkpykafkajoin.py:39 vs README.md:84),
   so the name parses to null and only email/phone/birthDay survive.

The envelope also carries a redundant twin ``zsetEntries`` array
(README.md:69-72); the schema keeps only ``zSetEntries`` and from_json
tolerates the extra field.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DateType,
    FloatType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Envelope of one Redis write event on the `redis-server` topic.
# Reference declaration: sparkpykafkajoin.py:16-34.
REDIS_SCHEMA = StructType(
    [
        StructField("key", StringType()),  # base64 of the Redis key
        StructField("existType", StringType()),
        StructField("ch", StringType()),  # bool on the wire; coerced
        StructField("incr", BooleanType()),
        StructField(
            "zSetEntries",
            ArrayType(
                StructType(
                    [
                        # base64 of the inner customer JSON document
                        StructField("element", StringType()),
                        StructField("score", StringType()),  # number on the wire
                    ]
                )
            ),
        ),
    ]
)

# Inner customer document (base64-decoded zSetEntries[0].element).
# Reference declaration: sparkpykafkajoin.py:37-44 — exactly
# (customer, email, phone, birthDay). `customer` is the deliberate
# mismatch for wire field `customerName` (parses to null), so only
# email/phone/birthDay survive the decode.
CUSTOMER_SCHEMA = StructType(
    [
        StructField("customer", StringType()),
        StructField("email", StringType()),
        StructField("phone", StringType()),
        StructField("birthDay", StringType()),
    ]
)

# Risk event on the `stedi-events` topic (single-encoded JSON).
# Reference declaration: sparkpykafkajoin.py:47-53. riskDate arrives as
# an ISO-8601 timestamp string and is down-cast to DateType.
STEDI_SCHEMA = StructType(
    [
        StructField("customer", StringType()),
        StructField("score", FloatType()),
        StructField("riskDate", DateType()),
    ]
)

# Engine-internal variant keeping event time as a proper timestamp so
# watermarks / windowed aggregates (SURVEY §7 phase 3) can use it.
STEDI_SCHEMA_TS = StructType(
    [
        StructField("customer", StringType()),
        StructField("score", FloatType()),
        StructField("riskDate", TimestampType()),
    ]
)
