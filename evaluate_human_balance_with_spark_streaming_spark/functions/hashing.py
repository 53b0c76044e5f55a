"""Hashing expression helpers: seeded md5, MinHash signatures, SimHash.

Design note — portability over cleverness: signature components are
**numeric minima of seeded md5-derived 60-bit integers**
(md5_seeded_int). md5 is uniform, so ``min(hash(seed || shingle))``
is a valid permutation-min estimator for Jaccard similarity, exactly
like classic integer MinHash, and the DuckDB oracles replay the same
bytes verbatim (('0x' || substr(md5(...),1,15))::BIGINT). Integer —
not hex-string — minima matter: numeric min plans a HashAggregate
(fixed-width buffer) where string min falls back to SortAggregate
(measured 1.65s → 0.58s on the sf0.1 signature build). No
engine-specific hash; Spark evaluates it all inside codegen.

SimHash packs sign-sums of per-token hash bits into a BIGINT; bits are
drawn from md5 hex digits so the oracle can reproduce them.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HEX_DIGITS = "0123456789abcdef"


def md5_seeded(col: Column, seed: int | str) -> Column:
    """Seeded md5 hex digest: md5('<seed>:' || col)."""
    return F.md5(F.concat(F.lit(f"{seed}:"), col))


def md5_seeded_int(col: Column, seed: int | str) -> Column:
    """Seeded 60-bit integer hash: the first 15 hex digits of the
    seeded md5 as a BIGINT (15 × 4 = 60 bits, no sign/overflow issues).

    This is the MinHash component type: min over a NUMERIC hash lets
    Spark plan a HashAggregate (fixed-width mutable buffer) instead of
    the SortAggregate it falls back to for string minima — measured
    1.65s → 0.58s for the 16-hash signature build at sf0.1, and the
    gap is a per-partition sort avoided at any scale. DuckDB replays
    it verbatim: ('0x' || substr(md5(...), 1, 15))::BIGINT."""
    return F.conv(F.substring(md5_seeded(col, seed), 1, 15), 16, 10).cast("bigint")


# NB: the signature itself is built explode-style in
# operators/dedup.py::minhash_signatures — per-seed
# array_min(transform(shingles, md5_seeded)) expressions are
# semantically identical but Spark interprets lambda functions (no
# codegen), measured ~20% slower and widening with document length.
# If you do write a transform() with a 2-parameter lambda, bind the
# seed via a closure factory: pyspark passes the array index to any
# 2-parameter lambda, silently overriding default args.


def band_key(signature_cols: list[Column], band: int, rows_per_band: int) -> Column:
    """LSH band key: md5 of the concatenated signature slice for this
    band (docs sharing any band key are near-dup candidates). Integer
    signature components are rendered as decimal strings — identical
    in Spark (CAST AS STRING) and DuckDB (array_to_string)."""
    lo = band * rows_per_band
    parts = signature_cols[lo : lo + rows_per_band]
    return F.md5(F.concat_ws("|", *[p.cast("string") for p in parts]))


def hash_bucket(id_col: Column, modulus: int) -> Column:
    """Deterministic sampling bucket 0..modulus-1: first 8 md5 hex
    digits of the stringified id as an integer, mod ``modulus``. The
    reproducible alternative to rand(): a row's bucket is stable
    across runs, engines, partitionings, and dataset growth. ONE
    definition for every sampling query; the DuckDB twin is
    sql_hash_bucket below."""
    return (
        F.conv(F.substring(F.md5(id_col.cast("string")), 1, 8), 16, 10).cast(
            "bigint"
        )
        % modulus
    )


def sql_hash_bucket(id_expr: str, modulus: int) -> str:
    """DuckDB fragment replaying hash_bucket verbatim — interpolate
    into oracle SQL so the two sides share one definition."""
    return (
        f"CAST(('0x' || substr(md5(CAST({id_expr} AS VARCHAR)), 1, 8)) "
        f"AS BIGINT) % {modulus}"
    )


def hex_digit_value(ch: Column) -> Column:
    """Value 0..15 of one lowercase hex digit character."""
    return F.instr(F.lit(HEX_DIGITS), ch) - 1


def simhash32(tokens_col: Column) -> Column:
    """32-bit SimHash of an array<string> token column, as BIGINT.

    Single-expression form, kept for per-row use (e.g. on a stream
    where explode+groupBy would add a stateful aggregate). The batch
    dedup operator uses operators/dedup.py::simhash_signatures
    instead: these 32 aggregate() folds are interpreted and re-hash
    every token once per bit, ~3× slower on the documents table.

    For bit j (0..31): draw the bit from hex digit j//4 of md5(token)
    (bit j%4 of the digit's value); sum +1/-1 contributions over all
    tokens; bit j of the result is 1 when the sum is positive. Packed
    as sum(bit_j << j).

    Expressed with aggregate() over the token array so the whole hash
    is one codegen'd expression per row — no explode, no shuffle.
    Null tokens are FILTERED before the fold: md5(NULL) is NULL and
    one null element would poison every bit's accumulator to NULL →
    hash 0, silently diverging from the batch twin (whose explode +
    F.sum path IGNORES nulls, SQL-aggregate style) and matching every
    other null-poisoned doc as a 0-distance near-dup (review finding;
    equivalence incl. null elements pinned by the shared-twin test).
    """
    tokens_col = F.filter(tokens_col, lambda t: t.isNotNull())

    def bit_of(tok: Column, j: int) -> Column:
        digit = hex_digit_value(F.substring(F.md5(tok), j // 4 + 1, 1))
        return F.shiftright(digit, j % 4).bitwiseAND(F.lit(1))

    def merge_for(j: int):
        # Closure factory: a 3-parameter lambda would make pyspark pass
        # the array index as the third argument (see module note above).
        return lambda acc, tok: acc + (bit_of(tok, j) * 2 - 1)

    packed = None
    for j in range(32):
        # Sum of (2*bit - 1) over tokens for this bit position.
        contrib = F.aggregate(tokens_col, F.lit(0), merge_for(j))
        bit = F.when(contrib > 0, F.lit(1).cast("bigint")).otherwise(F.lit(0).cast("bigint"))
        term = bit * F.lit(1 << j).cast("bigint")
        packed = term if packed is None else packed + term
    return packed
