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

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from ..sources.testdata import load_table

FEATURE_SCHEMA = (
    "id bigint, modality string, byte_len int, mean_byte double, feature_crc string"
)


def decode_ppm(payload: bytes) -> bytes:
    """Dependency-free binary-PPM (P6) decode: header ``P6 <w> <h>
    <maxval>`` (whitespace-separated, ``#`` comments allowed) followed
    by exactly one whitespace byte and ``w*h*3`` raw RGB bytes. Returns
    the pixel plane — the canonical decoded representation the feature
    extractors consume. Malformed input raises ValueError (a decode
    error, distinct from the NotImplementedError unsupported-codec
    seam)."""
    pos = 0
    n = len(payload)

    def token() -> bytes:
        nonlocal pos
        # Per the netpbm grammar a comment may begin wherever
        # whitespace is legal, INCLUDING immediately after a token
        # ('640#cols\n480' is a legal width/height pair — netpbm's own
        # pm_getuint stops the digit scan at the '#'); both the
        # skip loop and the token reader therefore treat '#' as a
        # delimiter, not token content.
        while pos < n:
            if payload[pos : pos + 1].isspace():
                pos += 1
            elif payload[pos : pos + 1] == b"#":
                while pos < n and payload[pos] != 0x0A:
                    pos += 1
            else:
                break
        start = pos
        while (
            pos < n
            and not payload[pos : pos + 1].isspace()
            and payload[pos : pos + 1] != b"#"
        ):
            pos += 1
        if start == pos:
            raise ValueError("ppm: truncated header")
        return payload[start:pos]

    if token() != b"P6":
        raise ValueError("ppm: not a P6 binary PPM")

    def header_int() -> int:
        tok = token()
        # Python's int() accepts '+1', '1_0', etc. — digits-only is
        # what the PPM header grammar allows.
        if not tok.isdigit():
            raise ValueError(f"ppm: bad header int {tok!r}")
        return int(tok)

    width, height, maxval = header_int(), header_int(), header_int()
    if maxval != 255:
        raise ValueError(f"ppm: only maxval 255 supported, got {maxval}")
    # Exactly one whitespace byte separates header and pixels. If the
    # maxval token was terminated by a '#' instead, blindly advancing
    # would swallow the comment marker and read comment text as raster
    # — reject loudly (a comment between maxval and the delimiter is a
    # grammar corner no real encoder produces).
    if pos >= n or not payload[pos : pos + 1].isspace():
        raise ValueError("ppm: missing raster delimiter after maxval")
    pos += 1
    pixels = payload[pos:]
    if width < 0 or height < 0 or len(pixels) != width * height * 3:
        raise ValueError(
            f"ppm: expected {width}x{height}x3={width * height * 3} pixel "
            f"bytes, got {len(pixels)}"
        )
    return pixels


def encode_ppm(width: int, height: int, pixels: bytes) -> bytes:
    """Inverse of decode_ppm (test fixture builder): wrap raw RGB bytes
    in a P6 header."""
    if len(pixels) != width * height * 3:
        raise ValueError("encode_ppm: pixel count mismatch")
    return b"P6\n%d %d\n255\n" % (width, height) + pixels


def decode_payload(payload: bytes, modality: str) -> bytes:
    """Decode a media payload to its canonical representation.

    'raw' passes through; 'image/ppm' runs the real dependency-free P6
    parse (header strip + pixel-plane validation) so the decode seam
    has a genuine non-identity traversal. Every other modality (JPEG,
    PCM, video) requires codec libraries not available in this
    environment and stays behind the documented NotImplementedError
    seam.
    """
    if modality == "raw":
        return payload
    if modality == "image/ppm":
        return decode_ppm(payload)
    raise NotImplementedError(
        f"decode for modality {modality!r} requires codec libraries "
        "(PIL/ffmpeg/torchaudio); wire them in here on a real cluster"
    )


def attach_binary_payload(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Model a multimodal table from the documents fixture: payload =
    utf-8 bytes of the text (a stand-in blob), modality = 'raw',
    metadata struct computed JVM-side (no Python for metadata).

    Deliberately NOT scan-spread (r16 measured): a round-robin
    exchange of the payload bytes before the mapInPandas/frame
    fan-out cost MORE than the parallelism bought back at fixture
    scale (mm_pandas_features 0.34 s → 0.59 s, mm_frame_sample
    0.18 s → 0.31 s with the spread) — the payload-bytes rule from
    the guide's §8: don't shuffle heavy opaque bytes to save light
    CPU. At cluster scale big files split naturally."""
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


def _decode_or_none(p, m) -> bytes | None:
    """NULL-tolerant decode for the Arrow batch loops: a NULL payload
    or modality (e.g. a NULL-text document flowing through
    attach_binary_payload) propagates as None — SQL null-in/null-out —
    instead of bytes(None) raising TypeError inside the Arrow worker
    and killing the whole job. Decode ERRORS (malformed payload,
    unsupported codec) still raise: data absence and data corruption
    are different events."""
    if p is None or m is None:
        return None
    return decode_payload(bytes(p), m)


def _payload_features(raw: bytes) -> tuple[int, float, str]:
    """Row-level deterministic fake features (byte_len, mean_byte,
    md5-prefix crc) — SINGLE definition shared by every mapInPandas
    pass so the oracle-certified fused path and the standalone path
    cannot drift apart. hashlib is imported at module scope: this
    function runs once per ROW inside the Arrow batch hot loop, and a
    function-local import pays a sys.modules lookup per row (review
    finding)."""
    return (
        len(raw),
        (sum(raw) / len(raw)) if len(raw) else 0.0,
        hashlib.md5(raw).hexdigest()[:8],
    )


def _stride_resize(raw: bytes, target_bytes: int) -> bytes:
    """Row-level deterministic stride 'resize' to a fixed byte budget
    (int(i*stride) is floor() — the oracle twin mirrors it). Shared by
    resize_payload and featurize_payloads."""
    if len(raw) <= target_bytes:
        return raw
    stride = len(raw) / target_bytes
    return bytes(raw[int(i * stride)] for i in range(target_bytes))


def extract_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over payload binaries.

    Deterministic fake features (mean byte value + a crc-style md5
    prefix) stand in for an embedding model; the mapInPandas plumbing —
    schema, batching, per-partition iteration — is the real article.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                None if d is None else _payload_features(d)
                for d in (
                    _decode_or_none(p, m)
                    for p, m in zip(pdf["payload"], pdf["modality"])
                )
            ]
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "modality": pdf["modality"],
                    "byte_len": [f[0] if f else None for f in feats],
                    "mean_byte": [f[1] if f else None for f in feats],
                    "feature_crc": [f[2] if f else None for f in feats],
                }
            )

    # mapInPandas ships EVERY input column through Arrow; drop the
    # JVM-side meta struct so only (id, modality, payload) crosses.
    return df.select("id", "modality", "payload").mapInPandas(
        extract, schema=FEATURE_SCHEMA
    )


def sample_frames(df: DataFrame, frame_bytes: int = 256) -> DataFrame:
    """Frame sampling over binary payloads, JVM-side: split each payload
    into fixed-size 'frames' (stand-in for video frame extraction) via
    explode(sequence(...)) — the fan-out shape of real frame sampling,
    with no Python in the path."""
    n_frames = F.ceil(F.col("meta.byte_len") / F.lit(frame_bytes)).cast("int")
    # Empty payloads must emit ZERO frames; without the filter,
    # sequence(0, -1) infers a NEGATIVE step and yields [0, -1] — two
    # spurious frames of md5('').
    return (
        df.filter(F.col("meta.byte_len") > 0)
        .withColumn("frame_idx", F.explode(F.sequence(F.lit(0), n_frames - 1)))
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
            WHERE regexp_matches(text, '^[\\x00-\\x7f]+$')
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
    JVM-side fan-out path. Certified domain is made explicit: both
    sides keep only non-empty ASCII docs, where the oracle's char-based
    substr equals the payload's byte slicing (and ceil(0/256)=0 never
    reaches sequence()). Non-ASCII payloads still flow through
    sample_frames itself — only the oracle twin needs the restriction.
    FIXTURE BOUND: the oracle enumerates frame indexes from
    range(0, 1000), i.e. it certifies docs up to 1000*256 = 256,000
    bytes; the Spark side is unbounded. Like the ivf oracle's
    range(1, 65) width pin this is a property of the driver fixtures
    (max document length ~2 KB) — raise the range if fixtures grow."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("text").rlike("^[\\x00-\\x7F]+$")
    )
    return sample_frames(attach_binary_payload(d, "text", "doc_id"))


RESIZE_SCHEMA = "id bigint, resized binary, out_len int"


def resize_payload(df: DataFrame, target_bytes: int = 64) -> DataFrame:
    """'Resize' binary payloads to a fixed byte budget via deterministic
    stride sampling — the shape (Arrow batch in, smaller binary out) of
    a real image-resize Pandas UDF; swap the body for PIL/cv2 on a
    cluster with codecs. Runs in mapInPandas so payload bytes never
    round-trip through row-at-a-time Python."""

    def resize(batches):
        for pdf in batches:
            out = [
                None if d is None else _stride_resize(d, target_bytes)
                for d in (
                    _decode_or_none(p, m)
                    for p, m in zip(pdf["payload"], pdf["modality"])
                )
            ]
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "resized": out,
                    "out_len": [None if o is None else len(o) for o in out],
                }
            )

    return df.select("id", "modality", "payload").mapInPandas(
        resize, schema=RESIZE_SCHEMA
    )


PANDAS_FEATURE_SCHEMA = (
    "id bigint, byte_len int, mean_byte double, feature_crc string, "
    "out_len int, resized_md5 string"
)


def featurize_payloads(df: DataFrame, target_bytes: int = 64) -> DataFrame:
    """Feature extraction AND resize in ONE Arrow-batched pass — at
    scale you never run two mapInPandas stages over the same payloads
    when one pass computes both (payload bytes cross the JVM↔Arrow
    boundary once). Emits deterministic features (mean byte, md5
    prefix) plus the stride-resize digest, all oracle-reproducible
    because payloads here are utf-8 text."""

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                _decode_or_none(p, m)
                for p, m in zip(pdf["payload"], pdf["modality"])
            ]
            feats = [None if p is None else _payload_features(p) for p in payloads]
            resized = [
                None if p is None else _stride_resize(p, target_bytes)
                for p in payloads
            ]
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "byte_len": [f[0] if f else None for f in feats],
                    "mean_byte": [f[1] if f else None for f in feats],
                    "feature_crc": [f[2] if f else None for f in feats],
                    "out_len": [None if r is None else len(r) for r in resized],
                    "resized_md5": [
                        None if r is None else hashlib.md5(r).hexdigest()
                        for r in resized
                    ],
                }
            )

    # Only (id, modality, payload) crosses the Arrow boundary — the
    # metadata struct stays JVM-side (see extract_features).
    return df.select("id", "modality", "payload").mapInPandas(
        featurize, schema=PANDAS_FEATURE_SCHEMA
    )


@register(
    "mm_pandas_features",
    oracle="""
        SELECT doc_id AS id,
               CAST(length(text) AS INTEGER) AS byte_len,
               ROUND(list_aggregate(
                   list_transform(range(1, length(text) + 1),
                                  i -> unicode(substr(text, i, 1))),
                   'sum')::DOUBLE / length(text), 6) AS mean_byte,
               substr(md5(text), 1, 8) AS feature_crc,
               CAST(least(length(text), 64) AS INTEGER) AS out_len,
               md5(CASE WHEN length(text) <= 64 THEN text
                   ELSE array_to_string(
                       list_transform(range(0, 64),
                           i -> substr(text,
                                       CAST(floor(i * (length(text) / 64.0)) AS INTEGER) + 1,
                                       1)),
                       '') END) AS resized_md5
        FROM documents
        WHERE regexp_matches(text, '^[\\x00-\\x7f]+$')
    """,
    tags=("multimodal", "pandas-udf"),
)
def q_mm_pandas_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Arrow-batched (mapInPandas) feature-extract + resize pass,
    HASH-CHECKED: for non-empty ASCII payloads every Python-computed
    feature (mean byte, md5 prefix, stride-resize digest) has an exact
    relational twin the DuckDB oracle replays byte-for-byte —
    upgrading this Python seam from a rows-only check to a full
    value-hash certification. That domain is enforced by an identical
    filter on BOTH sides (chars == bytes only for ASCII; empty docs
    would be 0.0-vs-NULL mean), so parity survives any fixture
    regeneration instead of silently assuming it. Python float
    division and DuckDB double division share IEEE semantics; the
    stride index int(i*stride) is floor() on both sides."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("text").rlike("^[\\x00-\\x7F]+$")
    )
    feats = featurize_payloads(attach_binary_payload(d, "text", "doc_id"))
    return feats.select(
        "id",
        "byte_len",
        F.round("mean_byte", 6).alias("mean_byte"),
        "feature_crc",
        "out_len",
        "resized_md5",
    )
