"""Text expression helpers (tokenization, normalization, shingling,
fingerprinting) — all Column-in/Column-out built-ins, no UDFs.

Shingling uses higher-order array functions (transform over a generated
index sequence), which Tungsten evaluates per-row without Python round
trips — at 100 TB this is the difference between a scan-bound job and a
serialization-bound one.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def collapse_whitespace(col: Column) -> Column:
    """Trim + collapse runs of whitespace to single spaces."""
    return F.trim(F.regexp_replace(col, r"\s+", " "))


def normalize_text(col: Column) -> Column:
    """Canonical text form for exact/fingerprint dedup: lowercase,
    whitespace-collapsed."""
    return collapse_whitespace(F.lower(col))


def tokens(col: Column) -> Column:
    """Whitespace tokens of the trimmed text (array<string>)."""
    return F.split(F.trim(col), r"\s+")


def fingerprint_md5(col: Column) -> Column:
    """128-bit document fingerprint: md5 of the normalized text."""
    return F.md5(normalize_text(col))


def word_shingles(col: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles (array<string>).

    transform(sequence(1, len-n+1), i -> concat_ws(' ', slice(words, i, n)))
    — pure built-ins; empty array when the document has < n words.
    """
    words = tokens(col)
    count = F.greatest(F.size(words) - (n - 1), F.lit(0))
    grams = F.transform(
        F.sequence(F.lit(1), count),
        lambda i: F.concat_ws(" ", F.slice(words, i, n)),
    )
    # sequence(1, 0) is invalid; guard with an empty array.
    grams = F.when(count > 0, grams).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(grams)
