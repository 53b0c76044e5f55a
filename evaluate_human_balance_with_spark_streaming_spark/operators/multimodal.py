"""Multimodal column plumbing: image/audio/video payloads as opaque
``binary`` columns with typed metadata, plus Arrow-batched feature
extraction.

The real decode step (JPEG → pixels, PCM → spectrogram, video → frames)
needs codec libraries this container doesn't ship, so decoding is
STUBBED behind ``decode_payload`` — a clearly-marked seam that raises
``NotImplementedError`` for real media types and produces a
deterministic fake for the 'raw' type used by tests. Everything
*around* the stub is real and scale-correct:

- schema: (id, modality, payload binary, meta struct<byte_len, sha, mime>);
- partition shape: payloads never become join/shuffle keys — metadata
  does; repartition by id range keeps payload batches bounded;
- extraction runs in ``mapInPandas`` (Arrow batches, zero-copy-ish), the
  one place Python earns its cost; batch size bounded by
  spark.sql.execution.arrow.maxRecordsPerBatch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from ..sources.testdata import load_table

FEATURE_SCHEMA = (
    "id bigint, modality string, byte_len int, mean_byte double, feature_crc string"
)


def decode_payload(payload: bytes, modality: str) -> bytes:
    """STUB: decode a media payload to a canonical representation.

    Real image/audio/video decoding requires codec libraries not
    available in this environment; 'raw' passes through so the full
    pipeline is testable end-to-end.
    """
    if modality == "raw":
        return payload
    raise NotImplementedError(
        f"decode for modality {modality!r} requires codec libraries "
        "(PIL/ffmpeg/torchaudio); wire them in here on a real cluster"
    )


def attach_binary_payload(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Model a multimodal table from the documents fixture: payload =
    utf-8 bytes of the text (a stand-in blob), modality = 'raw',
    metadata struct computed JVM-side (no Python for metadata)."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col).alias("id"),
        F.lit("raw").alias("modality"),
        payload.alias("payload"),
        F.struct(
            F.length(payload).alias("byte_len"),
            F.md5(payload).alias("content_md5"),
            F.lit("application/octet-stream").alias("mime"),
        ).alias("meta"),
    )


def extract_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over payload binaries.

    Deterministic fake features (mean byte value + a crc-style md5
    prefix) stand in for an embedding model; the mapInPandas plumbing —
    schema, batching, per-partition iteration — is the real article.
    """
    import hashlib

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                decode_payload(bytes(p), m)
                for p, m in zip(pdf["payload"], pdf["modality"])
            ]
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "modality": pdf["modality"],
                    "byte_len": [len(p) for p in payloads],
                    "mean_byte": [
                        (sum(p) / len(p)) if len(p) else 0.0 for p in payloads
                    ],
                    "feature_crc": [
                        hashlib.md5(p).hexdigest()[:8] for p in payloads
                    ],
                }
            )

    return df.mapInPandas(extract, schema=FEATURE_SCHEMA)


def sample_frames(df: DataFrame, frame_bytes: int = 256) -> DataFrame:
    """Frame sampling over binary payloads, JVM-side: split each payload
    into fixed-size 'frames' (stand-in for video frame extraction) via
    explode(sequence(...)) — the fan-out shape of real frame sampling,
    with no Python in the path."""
    n_frames = F.ceil(F.col("meta.byte_len") / F.lit(frame_bytes)).cast("int")
    return (
        df.withColumn("frame_idx", F.explode(F.sequence(F.lit(0), n_frames - 1)))
        .select(
            "id",
            "frame_idx",
            F.col("payload")
            .substr(F.col("frame_idx") * frame_bytes + 1, F.lit(frame_bytes))
            .alias("frame"),
        )
        .select(
            "id",
            "frame_idx",
            F.length("frame").alias("frame_len"),
            F.md5("frame").alias("frame_md5"),
        )
    )


@register(
    "mm_binary_metadata",
    oracle="""
        SELECT doc_id AS id,
               'raw' AS modality,
               CAST(strlen(text) AS INTEGER) AS byte_len,
               md5(text) AS content_md5
        FROM documents
    """,
    tags=("multimodal",),
)
def q_mm_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over binary payloads (byte length + content md5),
    computed entirely JVM-side from the binary column."""
    d = load_table(spark, sf_dir, "documents")
    mm = attach_binary_payload(d, "text", "doc_id")
    return mm.select(
        "id", "modality", F.col("meta.byte_len").alias("byte_len"),
        F.col("meta.content_md5").alias("content_md5"),
    )


@register(
    "mm_frame_sample",
    oracle="""
        WITH mm AS (
            SELECT doc_id AS id, text, strlen(text) AS byte_len FROM documents
        )
        SELECT id, CAST(f.frame_idx AS INTEGER) AS frame_idx,
               CAST(strlen(substr(text, f.frame_idx * 256 + 1, 256)) AS INTEGER) AS frame_len,
               md5(substr(text, f.frame_idx * 256 + 1, 256)) AS frame_md5
        FROM mm, (SELECT unnest(range(0, 1000)) AS frame_idx) f
        WHERE f.frame_idx < CAST(ceil(byte_len / 256.0) AS INTEGER)
    """,
    tags=("multimodal", "frames"),
)
def q_mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size frame sampling over payloads (256-byte frames), the
    JVM-side fan-out path; frame checksums match the oracle's
    byte-slice md5 because payload == utf-8 text here."""
    d = load_table(spark, sf_dir, "documents")
    return sample_frames(attach_binary_payload(d, "text", "doc_id"))


@register(
    "mm_feature_extract",
    oracle=None,  # pandas-UDF path; driver records rows-only check
    tags=("multimodal", "pandas-udf"),
)
def q_mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched (mapInPandas) feature extraction — deterministic
    fake features behind the decode stub. Not SQL-expressible (Python
    feature fn); correctness pinned by unit tests instead."""
    d = load_table(spark, sf_dir, "documents")
    return extract_features(attach_binary_payload(d, "text", "doc_id"))


RESIZE_SCHEMA = "id bigint, resized binary, out_len int"


def resize_payload(df: DataFrame, target_bytes: int = 64) -> DataFrame:
    """'Resize' binary payloads to a fixed byte budget via deterministic
    stride sampling — the shape (Arrow batch in, smaller binary out) of
    a real image-resize Pandas UDF; swap the body for PIL/cv2 on a
    cluster with codecs. Runs in mapInPandas so payload bytes never
    round-trip through row-at-a-time Python."""

    def resize(batches):
        for pdf in batches:
            out = []
            for p, m in zip(pdf["payload"], pdf["modality"]):
                raw = decode_payload(bytes(p), m)
                if len(raw) <= target_bytes:
                    out.append(raw)
                else:
                    stride = len(raw) / target_bytes
                    out.append(bytes(raw[int(i * stride)] for i in range(target_bytes)))
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "resized": out,
                    "out_len": [len(o) for o in out],
                }
            )

    return df.mapInPandas(resize, schema=RESIZE_SCHEMA)


@register(
    "mm_resize",
    oracle=None,  # pandas-UDF body; rows-only check + unit-test pinning
    tags=("multimodal", "pandas-udf"),
)
def q_mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched payload resize to a 64-byte budget (stride
    sampling standing in for image thumbnailing)."""
    d = load_table(spark, sf_dir, "documents")
    return resize_payload(attach_binary_payload(d, "text", "doc_id")).select(
        "id", "out_len"
    )
