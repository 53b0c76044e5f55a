"""Vector expression helpers over array<float|double> embedding columns.

All computed with zip_with / aggregate higher-order functions — JVM-side
sequential folds, so the accumulation order (and therefore the floating
point result) is deterministic and reproducible by the DuckDB oracle's
list functions. Cast to double before accumulating: float32 inputs,
float64 math, one rounding at the end.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(col: Column) -> Column:
    return col.cast("array<double>")


def dot_product(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(_as_double(a), F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    # try_divide: an all-zero vector has norm 0.0, and under Spark 4's
    # default ANSI mode a plain `/` THROWS DIVIDE_BY_ZERO and kills the
    # job — one bad vector must yield null, not a crashed pipeline
    # (same hardening discipline as try_to_binary in the decode chain).
    return F.try_divide(dot_product(a, b), l2_norm(a) * l2_norm(b))
