"""Unit tests for the STEDI parity pipelines — the reference's quirk
semantics (SURVEY §1.3) pinned on hand-built fixtures (FIXTURES.md F1/F2),
batch mode (identical plans run streaming; see test_streaming.py)."""

from __future__ import annotations

import json

from evaluate_human_balance_with_spark_streaming_spark.plans import stedi


from conftest import b64, envelope  # the shared wire builder


def wire_df(spark, values: list[str]):
    return spark.createDataFrame([(v,) for v in values], "value string")


def test_decode_chain_happy_path(spark):
    raw = wire_df(
        spark,
        [
            envelope(
                {
                    "customerName": "Sam Test",
                    "email": "sam.test@test.com",
                    "phone": "8015551212",
                    "birthDay": "2001-01-03",
                }
            )
        ],
    )
    rows = stedi.customer_pipeline(raw).collect()
    assert [(r.email, r.birthYear) for r in rows] == [("sam.test@test.com", "2001")]


def test_customer_name_field_mismatch_quirk(spark):
    """Wire field is customerName; schema declares customer → null
    (reference sparkpykafkajoin.py:39 vs README.md:84)."""
    raw = wire_df(
        spark,
        [envelope({"customerName": "X", "email": "a@b.c", "birthDay": "1990-05-01"})],
    )
    decoded = stedi.decode_customers(raw).collect()
    assert decoded[0].customer is None
    assert decoded[0].email == "a@b.c"


def test_decoded_columns_match_reference_schema(spark):
    """decode_customers yields exactly the reference's customerSchema
    columns (customer, email, phone, birthDay — sparkpykafkajoin.py:37-44);
    phone survives the decode, customerName does not."""
    raw = wire_df(
        spark,
        [
            envelope(
                {
                    "customerName": "X",
                    "email": "a@b.c",
                    "phone": "8015551212",
                    "birthDay": "1990-05-01",
                }
            )
        ],
    )
    decoded = stedi.decode_customers(raw)
    assert decoded.columns == ["customer", "email", "phone", "birthDay"]
    assert decoded.collect()[0].phone == "8015551212"


def test_missing_fields_filtered(spark):
    raw = wire_df(
        spark,
        [
            envelope({"customerName": "NoEmail", "birthDay": "1990-01-01"}),
            envelope({"customerName": "NoBirth", "email": "x@y.z"}),
            envelope({"customerName": "OK", "email": "ok@y.z", "birthDay": "1980-02-03"}),
        ],
    )
    rows = stedi.customer_pipeline(raw).collect()
    assert [(r.email, r.birthYear) for r in rows] == [("ok@y.z", "1980")]


def test_malformed_payloads_do_not_crash(spark):
    raw = wire_df(
        spark,
        [
            "not json at all",
            json.dumps({"key": b64("Customer"), "zSetEntries": []}),
            envelope("this-is-not-json"),
            envelope({"customerName": "OK", "email": "ok@y.z", "birthDay": "1980-02-03"}),
        ],
    )
    rows = stedi.customer_pipeline(raw).collect()
    assert [(r.email, r.birthYear) for r in rows] == [("ok@y.z", "1980")]


def test_only_first_zset_entry_read(spark):
    """Pipeline reads zSetEntries[0] only (reference
    sparkpykafkajoin.py:111-113)."""
    raw = wire_df(
        spark,
        [
            envelope(
                {"customerName": "A", "email": "first@y.z", "birthDay": "1970-06-07"},
                extra_entries=2,
            )
        ],
    )
    rows = stedi.customer_pipeline(raw).collect()
    assert [r.email for r in rows] == ["first@y.z"]


def test_risk_parse_and_date_downcast(spark):
    raw = wire_df(
        spark,
        [json.dumps({"customer": "a@b.c", "score": -2.5, "riskDate": "2020-09-14T07:54:06.417Z"})],
    )
    rows = stedi.parse_risk_events(raw).collect()
    assert rows[0].customer == "a@b.c"
    assert abs(rows[0].score - (-2.5)) < 1e-6

    with_ts = stedi.parse_risk_events(raw, keep_timestamp=True).collect()
    assert with_ts[0].riskDate is not None


def test_flagship_join_semantics(spark):
    """Inner join drops unmatched risk; duplicate customer records
    multiply (SURVEY §2.4)."""
    cust = wire_df(
        spark,
        [
            envelope({"customerName": "A", "email": "a@b.c", "birthDay": "1990-01-01"}),
            envelope({"customerName": "A", "email": "a@b.c", "birthDay": "1990-01-01"}),
            envelope({"customerName": "B", "email": "b@b.c", "birthDay": "1985-03-04"}),
        ],
    )
    risk = wire_df(
        spark,
        [
            json.dumps({"customer": "a@b.c", "score": 1.0, "riskDate": "2020-01-01T00:00:00.000Z"}),
            json.dumps({"customer": "nobody@b.c", "score": 9.0, "riskDate": "2020-01-01T00:00:00.000Z"}),
        ],
    )
    rows = stedi.flagship_pipeline(cust, risk).collect()
    # a@b.c joins twice (duplicate customer record), nobody@ dropped.
    assert len(rows) == 2
    assert {r.email for r in rows} == {"a@b.c"}
    assert {r.birthYear for r in rows} == {"1990"}


def test_serialize_for_kafka_shape(spark):
    df = spark.createDataFrame(
        [("a@b.c", "1.5", "a@b.c", "1990")],
        "customer string, score string, email string, birthYear string",
    )
    out = stedi.serialize_for_kafka(df).collect()
    payload = json.loads(out[0].value)
    assert payload == {
        "customer": "a@b.c",
        "score": "1.5",
        "email": "a@b.c",
        "birthYear": "1990",
    }


def test_serialize_risk_payload_string_score_and_null_dropping(spark):
    """The certified sink payload: score rides as a JSON *string*
    (README.md:159-164 target shape — the projection the production
    job and the oracle query now share), and to_json DROPS null
    fields — the oracle replays that with conditional fragments, so
    this pins the engine behavior the oracle encodes."""
    df = spark.createDataFrame(
        [("a@b.c", 1.5, "a@b.c", "1990"), ("x@y.z", None, "x@y.z", None)],
        "customer string, score float, email string, birthYear string",
    )
    rows = {json.loads(r.value)["customer"]: json.loads(r.value)
            for r in stedi.serialize_risk_payload(df).collect()}
    assert rows["a@b.c"]["score"] == "1.5"          # string, not number
    assert "score" not in rows["x@y.z"]             # null field dropped
    assert "birthYear" not in rows["x@y.z"]
    assert rows["x@y.z"]["email"] == "x@y.z"


def test_encode_decode_roundtrip(spark):
    plain = spark.createDataFrame(
        [("Sam Test", "sam@test.com", "8015551212", "2001-01-03")],
        "customerName string, email string, phone string, birthDay string",
    )
    wire = stedi.encode_customer_envelope(plain)
    rows = stedi.customer_pipeline(wire).collect()
    assert [(r.email, r.birthYear) for r in rows] == [("sam@test.com", "2001")]
