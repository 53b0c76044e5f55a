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

# Whitespace as an EXPLICIT character class, not `\s` — Java regex
# (Spark) counts vertical tab \x0B as \s, RE2 (the DuckDB oracles)
# does not, so the shorthand silently diverges cross-engine on any
# document containing \x0B and flips every downstream value hash
# (token counts, fingerprints, language gates). The two constants
# below spell the SAME set in each engine's syntax; every whitespace
# regex on either side must be built from them. (Latent-only today —
# the driver fixtures contain no \x0B — pinned by a \x0B parity test
# in tests/test_operators.py.)
WS_CHARS = r" \t\n\r\f\x0B"  # Java regex spelling (Spark side)
SQL_WS_CHARS = r" \t\n\r\f\v"  # RE2 spelling (DuckDB oracle side)
WS = f"[{WS_CHARS}]"
SQL_WS = f"[{SQL_WS_CHARS}]"


def collapse_whitespace(col: Column) -> Column:
    """Trim + collapse runs of whitespace to single spaces."""
    return F.trim(F.regexp_replace(col, WS + "+", " "))


def normalize_text(col: Column) -> Column:
    """Canonical text form for exact/fingerprint dedup: lowercase,
    whitespace-collapsed."""
    return collapse_whitespace(F.lower(col))


def ws_trim(col: Column) -> Column:
    """Strip leading/trailing whitespace of the FULL class — F.trim
    strips ASCII spaces only, so tab/newline-edged text left empty
    edge tokens in every split (review finding, verified by
    execution: tokens('\\tfoo bar') was ['', 'foo', 'bar'], and
    word_shingles then built degenerate ' foo'-style shingles).
    ``SQL_WS_TRIM_TEXT`` below is the DuckDB twin for the `text`
    column; every split-feeding trim must use this PAIR, never bare
    trim()."""
    return F.regexp_replace(col, f"^{WS}+|{WS}+$", "")


SQL_WS_TRIM_TEXT = f"regexp_replace(text, '^{SQL_WS}+|{SQL_WS}+$', '', 'g')"


def tokens(col: Column) -> Column:
    """Whitespace tokens of the trimmed text (array<string>)."""
    return F.split(ws_trim(col), WS + "+")


def fingerprint_md5(col: Column) -> Column:
    """128-bit document fingerprint: md5 of the normalized text."""
    return F.md5(normalize_text(col))


def word_shingles(col: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles (array<string>).

    Built as n-1 nested zip_withs of the word array against its own
    k-shifted slices, null-marking short tails and filtering them out.
    Chosen over the obvious transform(sequence(1, len-n+1),
    i -> concat_ws(' ', slice(words, i, n))): higher-order lambdas are
    interpreted, so that form re-evaluates the `words` split once PER
    INDEX (~L splits per row); the zip_with form evaluates it O(n)
    times and does linear cheap concats per element — measured 4×
    faster (2.0s → 0.55s for the sf0.1 shingle table). Documents with
    < n words yield an empty array in both forms.
    """
    words = tokens(col)
    acc = words
    for k in range(1, n):
        shifted = F.slice(words, k + 1, F.greatest(F.size(words) - k, F.lit(0)))
        acc = F.zip_with(
            acc,
            shifted,
            lambda a, b: F.when(
                a.isNull() | b.isNull(), F.lit(None).cast("string")
            ).otherwise(F.concat(a, F.lit(" "), b)),
        )
    return F.array_distinct(F.filter(acc, lambda x: x.isNotNull()))
